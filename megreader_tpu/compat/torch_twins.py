"""Torch twins for the non-CTC judged model families — parity oracles.

Extends ``compat.torch_ref`` (the CTC/BiLSTM twin) to the remaining three
judged families (SURVEY.md §2.4, BASELINE configs #2–#4):

* ``TorchCtc2dRecognizer`` — rec2d trunk + class/height(/markov) heads
* ``TorchAttentionRecognizer`` — rec2d trunk + GRU decoder with 2-D
  additive attention (torch gate order)
* ``TorchSegDetector`` — det trunk + FPN neck + DB prob/thresh heads

Each twin's module names mirror the flax module tree so
``convert_state_dict`` maps its ``state_dict()`` 1:1 onto the flax
variables; the same machinery later loads real reference checkpoints via a
``name_map``. Torch is CPU-only in this image and is used for
testing/conversion only.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from .torch_ref import TorchBasicBlock


class TorchResNetGrid(nn.Module):
    """Rec-family trunk with configurable stage strides.

    strides=[(1,1),(2,2),(2,1),(2,1)] -> flax variant='rec'
    strides=[(1,1),(2,2),(2,1),(1,1)] -> flax variant='rec2d'
    """

    def __init__(self, stage_sizes=(2, 2, 2, 2), width=64, strides=None):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, width, 3, 1, 1, bias=False)
        self.stem_bn = nn.BatchNorm2d(width)
        self.pool = nn.MaxPool2d(2, 2)
        strides = strides or [(1, 1), (2, 2), (2, 1), (1, 1)]
        in_ch = width
        for i, (n, s) in enumerate(zip(stage_sizes, strides)):
            for j in range(n):
                out_ch = width * (2**i)
                block = TorchBasicBlock(in_ch, out_ch, s if j == 0 else (1, 1))
                setattr(self, f"layer{i + 1}_block{j}", block)
                in_ch = out_ch
        self.stage_sizes = stage_sizes

    def forward(self, x):
        y = self.pool(torch.relu(self.stem_bn(self.stem_conv(x))))
        for i, n in enumerate(self.stage_sizes):
            for j in range(n):
                y = getattr(self, f"layer{i + 1}_block{j}")(y)
        return y  # (B, C, H, W)


class TorchResNetDet(nn.Module):
    """Detection trunk: 7×7 s2 stem + 3×3 s2 maxpool, C2–C5 pyramid.

    Module names mirror flax ``ResNet(variant='det')``; parameter names are
    also exactly torchvision's when exported via
    ``torchvision_style_state_dict`` (tested ingestion path for ImageNet
    pretrained backbones, SURVEY.md §2.3).
    """

    def __init__(self, stage_sizes=(2, 2, 2, 2), width=64):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(width)
        in_ch = width
        for i, n in enumerate(stage_sizes):
            s = (1, 1) if i == 0 else (2, 2)
            for j in range(n):
                out_ch = width * (2**i)
                block = TorchBasicBlock(in_ch, out_ch, s if j == 0 else (1, 1))
                setattr(self, f"layer{i + 1}_block{j}", block)
                in_ch = out_ch
        self.stage_sizes = stage_sizes

    def forward(self, x):
        y = torch.relu(self.stem_bn(self.stem_conv(x)))
        y = F.max_pool2d(y, 3, stride=2, padding=1)
        feats = []
        for i, n in enumerate(self.stage_sizes):
            for j in range(n):
                y = getattr(self, f"layer{i + 1}_block{j}")(y)
            feats.append(y)
        return feats  # [C2, C3, C4, C5]


# ---------------------------------------------------------------------------
# 2D-CTC twin (config #2)
# ---------------------------------------------------------------------------


class TorchCtc2dRecognizer(nn.Module):
    """Twin of flax ``Ctc2dRecognizerNet`` (independent or markov)."""

    def __init__(self, num_classes=37, width=64, transition="independent"):
        super().__init__()
        self.backbone = TorchResNetGrid(width=width)  # rec2d strides
        feat = width * 8
        self.class_head = nn.Linear(feat, num_classes)
        self.transition = transition
        if transition == "independent":
            self.height_head = nn.Linear(feat, 1)
        else:
            # markov: trans head emits H' scores per (column, h_prev); H' is
            # data-dependent in flax (feat height). For 32-high crops H'=4.
            self.trans_head = nn.Linear(feat, 4)
            self.init_head = nn.Linear(feat, 1)

    def forward(self, x):  # (B, 3, H, W)
        feat = self.backbone(x)  # (B, C, H', W')
        feat = feat.permute(0, 3, 2, 1)  # (B, W'=T, H', C) — flax layout
        emit = torch.log_softmax(self.class_head(feat), dim=-1)
        if self.transition == "independent":
            h = torch.log_softmax(self.height_head(feat)[..., 0], dim=-1)
            return emit, h
        trans = torch.log_softmax(self.trans_head(feat), dim=-1)
        init = torch.log_softmax(self.init_head(feat[:, 0])[..., 0], dim=-1)
        return emit, trans, init


# ---------------------------------------------------------------------------
# Attention twin (config #3)
# ---------------------------------------------------------------------------


class TorchGRUCellTorchOrder(nn.Module):
    """GRU cell with explicit (w_ih, w_hh, b_ih, b_hh), gate order (r,z,n).

    Matches flax ``GRUCellTorchlike`` (models/attention.py) AND
    ``torch.nn.GRUCell`` semantics: n = tanh(i_n + r * (h @ W_hn + b_hn)).
    """

    def __init__(self, input_size, hidden):
        super().__init__()
        self.hidden = hidden
        self.w_ih = nn.Parameter(torch.zeros(3 * hidden, input_size))
        self.w_hh = nn.Parameter(torch.zeros(3 * hidden, hidden))
        self.b_ih = nn.Parameter(torch.zeros(3 * hidden))
        self.b_hh = nn.Parameter(torch.zeros(3 * hidden))

    def forward(self, x, h):
        gi = x @ self.w_ih.T + self.b_ih
        gh = h @ self.w_hh.T + self.b_hh
        i_r, i_z, i_n = gi.chunk(3, dim=-1)
        h_r, h_z, h_n = gh.chunk(3, dim=-1)
        r = torch.sigmoid(i_r + h_r)
        z = torch.sigmoid(i_z + h_z)
        n = torch.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class TorchEmbed(nn.Module):
    """Embedding whose parameter is named ``embedding`` (flax convention,
    no transpose in conversion)."""

    def __init__(self, num, dim):
        super().__init__()
        self.embedding = nn.Parameter(torch.zeros(num, dim))

    def forward(self, ids):
        return self.embedding[ids]


class TorchAttentionRecognizer(nn.Module):
    """Twin of flax ``AttentionRecognizerNet`` (models/attention.py)."""

    PAD, GO, EOS = 0, 1, 2

    def __init__(self, num_classes=39, width=64, dim=64, feat_hw=(4, 25)):
        super().__init__()
        self.trunk = TorchResNetGrid(width=width)  # rec2d
        feat = width * 8
        H, W = feat_hw
        self.mem_proj = nn.Linear(feat, dim)
        self.pos2d = nn.Parameter(torch.zeros(1, H, W, dim))
        self.embed = TorchEmbed(num_classes, dim)
        self.gru = TorchGRUCellTorchOrder(2 * dim, dim)
        self.attn_mem = nn.Linear(dim, dim, bias=False)
        self.attn_state = nn.Linear(dim, dim, bias=False)
        self.attn_v = nn.Linear(dim, 1, bias=False)
        self.out = nn.Linear(2 * dim, num_classes)
        self.dim = dim
        self.num_classes = num_classes

    def encode(self, images):  # (B, 3, H, W)
        feat = self.trunk(images).permute(0, 2, 3, 1)  # (B, H, W, C) NHWC
        mem = self.mem_proj(feat) + self.pos2d
        B = mem.shape[0]
        mem = mem.reshape(B, -1, self.dim)
        return mem, self.attn_mem(mem)

    def decode_step(self, keys, mem, state, y_prev):
        score = self.attn_v(torch.tanh(keys + self.attn_state(state)[:, None, :]))[..., 0]
        w = torch.softmax(score, dim=1)
        ctx = torch.einsum("bn,bnd->bd", w, mem)
        x = torch.cat([self.embed(y_prev), ctx], dim=-1)
        new_state = self.gru(x, state)
        logits = self.out(torch.cat([new_state, ctx], dim=-1))
        return new_state, logits

    @torch.no_grad()
    def greedy(self, images, max_len=16):
        """Greedy decode with the same freeze-after-EOS semantics as
        ``AttentionRecognizer.decode_greedy``."""
        mem, keys = self.encode(images)
        B = images.shape[0]
        state = torch.zeros(B, self.dim)
        y = torch.full((B,), self.GO, dtype=torch.long)
        done = torch.zeros(B, dtype=torch.bool)
        ids = []
        for _ in range(max_len):
            new_state, logits = self.decode_step(keys, mem, state, y)
            y_next = logits.argmax(dim=-1)
            y_next = torch.where(done, torch.full_like(y_next, self.PAD), y_next)
            done = done | (y_next == self.EOS)
            state = torch.where(done[:, None], state, new_state)
            y = y_next
            ids.append(y_next)
        return torch.stack(ids, dim=1)  # (B, T)


# ---------------------------------------------------------------------------
# SegDetector twin (config #4)
# ---------------------------------------------------------------------------


def _upsample_to(x, h, w):
    # jax.image.resize(method='bilinear') == F.interpolate(align_corners=False)
    # (both half-pixel-center): verified by tests to 1e-5.
    return F.interpolate(x, size=(h, w), mode="bilinear", align_corners=False)


class TorchFPNNeck(nn.Module):
    def __init__(self, in_chs, dim=256, out_dim=256):
        super().__init__()
        c2, c3, c4, c5 = in_chs
        self.lat5 = nn.Conv2d(c5, dim, 1)
        self.lat4 = nn.Conv2d(c4, dim, 1)
        self.lat3 = nn.Conv2d(c3, dim, 1)
        self.lat2 = nn.Conv2d(c2, dim, 1)
        q = out_dim // 4
        for i in range(4):
            setattr(self, f"smooth{i + 2}", nn.Conv2d(dim, q, 3, 1, 1))

    def forward(self, feats):
        c2, c3, c4, c5 = feats
        p5 = self.lat5(c5)
        p4 = self.lat4(c4) + _upsample_to(p5, c4.shape[2], c4.shape[3])
        p3 = self.lat3(c3) + _upsample_to(p4, c3.shape[2], c3.shape[3])
        p2 = self.lat2(c2) + _upsample_to(p3, c2.shape[2], c2.shape[3])
        h, w = c2.shape[2], c2.shape[3]
        outs = [
            _upsample_to(getattr(self, f"smooth{i + 2}")(p), h, w)
            for i, p in enumerate([p2, p3, p4, p5])
        ]
        return torch.cat(outs, dim=1)


class TorchMapHead(nn.Module):
    def __init__(self, in_ch, dim=64):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, dim, 3, 1, 1, bias=False)
        self.bn = nn.BatchNorm2d(dim)
        self.up1 = nn.Conv2d(dim, dim // 2, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(dim // 2)
        self.up2 = nn.Conv2d(dim // 2, 1, 3, 1, 1)

    def forward(self, x):
        y = torch.relu(self.bn(self.conv(x)))
        h, w = y.shape[2], y.shape[3]
        y = torch.relu(self.bn1(self.up1(_upsample_to(y, h * 2, w * 2))))
        y = self.up2(_upsample_to(y, h * 4, w * 4))
        return torch.sigmoid(y[:, 0])  # (B, H, W)


class TorchSegDetector(nn.Module):
    """Twin of flax ``SegDetectorNet`` (models/detector.py)."""

    def __init__(self, width=64, fpn_dim=64, head_dim=16, k=50.0):
        super().__init__()
        self.backbone = TorchResNetDet(width=width)
        in_chs = [width, width * 2, width * 4, width * 8]
        self.fpn = TorchFPNNeck(in_chs, fpn_dim, fpn_dim)
        self.prob_head = TorchMapHead(fpn_dim, head_dim)
        self.thresh_head = TorchMapHead(fpn_dim, head_dim)
        self.k = k

    def forward(self, x):
        feats = self.backbone(x)
        fused = self.fpn(feats)
        prob = self.prob_head(fused)
        thresh = self.thresh_head(fused)
        binary = torch.sigmoid(self.k * (prob - thresh))
        return {"prob": prob, "thresh": thresh, "binary": binary}


# ---------------------------------------------------------------------------
# state_dict exporters (rename torch module paths -> flax module tree)
# ---------------------------------------------------------------------------


def ctc2d_flax_state_dict(model: TorchCtc2dRecognizer):
    out = {}
    for k, v in model.state_dict().items():
        out[k.replace("backbone.", "ResNet_0.")] = v
    return out


def attention_flax_state_dict(model: TorchAttentionRecognizer):
    # flax names already match (trunk, mem_proj, pos2d, embed, gru,
    # attn_mem, attn_state, attn_v, out) — export verbatim.
    return dict(model.state_dict())


def detector_flax_state_dict(model: TorchSegDetector):
    out = {}
    for k, v in model.state_dict().items():
        out[k.replace("backbone.", "ResNet_0.")] = v
    return out


def torchvision_style_state_dict(trunk: TorchResNetDet):
    """Export a det trunk in torchvision.models.resnet key format.

    conv1/bn1/layer{i}.{j}.{conv1,bn1,conv2,bn2,downsample.0,downsample.1}.
    Used to exercise the pretrained-backbone ingestion path
    (``torchvision_resnet_name_map``) without torchvision in the image.
    """
    out = {}
    for k, v in trunk.state_dict().items():
        nk = k
        nk = nk.replace("stem_conv.", "conv1.")
        nk = nk.replace("stem_bn.", "bn1.")
        for i in range(1, 5):
            for j in range(24):
                nk = nk.replace(f"layer{i}_block{j}.", f"layer{i}.{j}.")
        nk = nk.replace(".downsample_conv.", ".downsample.0.")
        nk = nk.replace(".downsample_bn.", ".downsample.1.")
        out[nk] = v
    return out
