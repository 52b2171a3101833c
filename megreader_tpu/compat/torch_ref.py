"""Torch twin of the flax CTC recognizer — the parity oracle.

A from-scratch PyTorch model whose module names mirror the flax module tree
exactly, so ``convert_state_dict`` maps its ``state_dict()`` 1:1 onto the
flax variables. Used by tests to prove the conversion + numerics pipeline
end-to-end (same activations, same greedy transcriptions) — the same
machinery later loads real reference checkpoints via a ``name_map``.

Torch is CPU-only in this image and is used for testing/conversion only;
nothing here runs in the TPU serving/training path.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=(1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.has_downsample = in_ch != out_ch or stride != (1, 1)
        if self.has_downsample:
            self.downsample_conv = nn.Conv2d(in_ch, out_ch, 1, stride, bias=False)
            self.downsample_bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        r = self.downsample_bn(self.downsample_conv(x)) if self.has_downsample else x
        return torch.relu(y + r)


class TorchResNetRec(nn.Module):
    """Matches flax ResNet(variant='rec', BasicBlock, stage_sizes)."""

    def __init__(self, stage_sizes=(2, 2, 2, 2), width=64):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, width, 3, 1, 1, bias=False)
        self.stem_bn = nn.BatchNorm2d(width)
        self.pool = nn.MaxPool2d(2, 2)
        strides = [(1, 1), (2, 2), (2, 1), (2, 1)]
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
        return y


class TorchLSTMDir(nn.Module):
    """Single-direction LSTM with explicit parameters (torch gate order)."""

    def __init__(self, input_size, hidden, reverse=False):
        super().__init__()
        self.hidden = hidden
        self.reverse = reverse
        self.w_ih = nn.Parameter(torch.zeros(4 * hidden, input_size))
        self.w_hh = nn.Parameter(torch.zeros(4 * hidden, hidden))
        self.b_ih = nn.Parameter(torch.zeros(4 * hidden))
        self.b_hh = nn.Parameter(torch.zeros(4 * hidden))

    def forward(self, x):  # (B, T, D)
        B, T, D = x.shape
        h = x.new_zeros(B, self.hidden)
        c = x.new_zeros(B, self.hidden)
        steps = range(T - 1, -1, -1) if self.reverse else range(T)
        out = [None] * T
        for t in steps:
            gates = x[:, t] @ self.w_ih.T + self.b_ih + h @ self.w_hh.T + self.b_hh
            i, f, g, o = gates.chunk(4, dim=-1)
            i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
            g = torch.tanh(g)
            c = f * c + i * g
            h = o * torch.tanh(c)
            out[t] = h
        return torch.stack(out, dim=1)


class TorchBiLSTM(nn.Module):
    def __init__(self, input_size, hidden):
        super().__init__()
        self.fwd = TorchLSTMDir(input_size, hidden, reverse=False)
        self.bwd = TorchLSTMDir(input_size, hidden, reverse=True)

    def forward(self, x):
        return torch.cat([self.fwd(x), self.bwd(x)], dim=-1)


class TorchCTCRecognizer(nn.Module):
    """Twin of flax CTCRecognizerNet(backbone='resnet18', encoder='bilstm')."""

    def __init__(self, num_classes=37, hidden=256, num_encoder_layers=2, width=64,
                 height_collapse="mean", feat_h=2):
        super().__init__()
        self.backbone = TorchResNetRec(width=width)
        self.height_collapse = height_collapse
        feat_dim = width * 8 * (feat_h if height_collapse == "reshape" else 1)
        layers = {}
        in_dim = feat_dim
        for i in range(num_encoder_layers):
            layers[f"layer{i}"] = TorchBiLSTM(in_dim, hidden)
            in_dim = 2 * hidden
        self.encoder = nn.ModuleDict(layers)
        self.classifier = nn.Linear(in_dim, num_classes)
        self.num_encoder_layers = num_encoder_layers

    def forward(self, x):  # x: (B, 3, H, W)
        feat = self.backbone(x)  # (B, C, H', W')
        if self.height_collapse == "reshape":
            B, C, H, W = feat.shape
            # (B, W', H'*C), rows h-major then channels — matches the flax
            # transpose+reshape in CTCRecognizerNet exactly.
            seq = feat.permute(0, 3, 2, 1).reshape(B, W, H * C)
        else:
            seq = feat.mean(dim=2).transpose(1, 2)  # (B, W', C)
        for i in range(self.num_encoder_layers):
            seq = self.encoder[f"layer{i}"](seq)
        return self.classifier(seq)  # (B, T, num_classes)


def flax_state_dict(model: TorchCTCRecognizer):
    """state_dict with keys renamed to mirror the flax module tree.

    flax tree: ResNet_0/... under net: backbone modules live under the
    anonymous ResNet instance; encoder layers under 'encoder'; classifier
    under 'classifier'.
    """
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("backbone.", "ResNet_0.")
        nk = nk.replace("encoder.layer", "encoder.layer")
        nk = nk.replace(".fwd.", ".fwd.").replace(".bwd.", ".bwd.")
        out[nk] = v
    return out
