"""Config system + charset tests (SURVEY.md §5.6 semantics)."""

import numpy as np

from megreader_tpu.core import (
    AttentionCharset,
    Charset,
    Config,
    apply_overrides,
    instantiate,
    parse_cli_overrides,
    register,
)


@register
class _Leaf:
    def __init__(self, value=0):
        self.value = value


@register
class _Node:
    def __init__(self, child, items=()):
        self.child = child
        self.items = items


def test_instantiate_nested():
    obj = instantiate(
        {
            "class": "_Node",
            "child": {"class": "_Leaf", "value": 3},
            "items": [{"class": "_Leaf", "value": 1}, 7],
        }
    )
    assert isinstance(obj, _Node)
    assert obj.child.value == 3
    assert obj.items[0].value == 1 and obj.items[1] == 7


def test_yaml_import_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("model:\n  lr: 0.01\n  depth: 18\n")
    exp = tmp_path / "exp.yaml"
    exp.write_text(f"import: [base.yaml]\nmodel:\n  lr: 0.1\nname: exp1\n")
    cfg = Config.load(str(exp))
    assert cfg["model"]["lr"] == 0.1  # importing file wins
    assert cfg["model"]["depth"] == 18  # inherited
    cfg2 = Config.load(str(exp), {"model.depth": 50})
    assert cfg2["model"]["depth"] == 50


def test_ref_resolution(tmp_path):
    f = tmp_path / "r.yaml"
    f.write_text("shared:\n  cs: {alphabet: abc}\nuser:\n  charset: '$ref:shared.cs'\n")
    cfg = Config.load(str(f))
    assert cfg["user"]["charset"] == {"alphabet": "abc"}


def test_cli_override_parse():
    ov = parse_cli_overrides(["--train.lr", "1e-3", "--validate", "--name", "foo"])
    assert ov["train.lr"] == 1e-3
    assert ov["validate"] is True
    assert ov["name"] == "foo"


def test_charset_roundtrip():
    cs = Charset()
    assert cs.num_classes == 37
    ids, n = cs.encode("Hello, World!", 16)
    assert n == 10  # "helloworld"
    assert cs.decode(ids[:n]) == "helloworld"
    labels, lens = cs.encode_batch(["ab", "xyz123"], 8)
    assert list(lens) == [2, 6]
    assert cs.decode_batch(labels, lens) == ["ab", "xyz123"]


def test_attention_charset_eos():
    cs = AttentionCharset()
    ids, n = cs.encode("ab", 8)
    assert ids[n - 1] == AttentionCharset.EOS
    assert cs.decode(ids) == "ab"
    # over-long text truncates but still terminates with EOS
    ids2, n2 = cs.encode("a" * 20, 8)
    assert n2 == 8 and ids2[7] == AttentionCharset.EOS
