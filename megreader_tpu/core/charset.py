"""Charsets: char <-> index maps for CTC / attention recognizers.

Mirrors the role of MegReader's charset handling [U: concern/charsets.py /
make_recognition_label]: the classic 36-char lowercase-alphanumeric default,
blank at index 0 (CTC convention, matching ``nn.CTCLoss(blank=0)``), optional
case sensitivity, and an unknown bucket. Attention decoders additionally use
GO/EOS/PAD tokens, provided by :class:`AttentionCharset`.

All encode paths produce fixed-length int32 arrays (static shapes for XLA);
lengths travel alongside.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .registry import register

DIGITS = "0123456789"
LOWERCASE = "abcdefghijklmnopqrstuvwxyz"
UPPERCASE = LOWERCASE.upper()
PUNCTUATION = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
DEFAULT_ALPHABET = DIGITS + LOWERCASE  # 36 chars; indices 1..36, blank=0
#: case-sensitive alnum + printable punctuation (the reference's larger set)
FULL_ALPHABET = DIGITS + LOWERCASE + UPPERCASE + PUNCTUATION


@register
class Charset:
    """CTC charset: index 0 is reserved for blank."""

    BLANK = 0

    def __init__(
        self,
        alphabet: str = DEFAULT_ALPHABET,
        case_sensitive: bool = False,
        unknown_as: str = "",
    ):
        self.case_sensitive = case_sensitive
        if not case_sensitive:
            alphabet = "".join(dict.fromkeys(alphabet.lower()))
        self.alphabet = alphabet
        self.unknown_as = unknown_as
        self._c2i = {c: i + 1 for i, c in enumerate(alphabet)}
        self._i2c = {i + 1: c for i, c in enumerate(alphabet)}

    @property
    def num_classes(self) -> int:
        """Including blank."""
        return len(self.alphabet) + 1

    def normalize(self, text: str) -> str:
        if not self.case_sensitive:
            text = text.lower()
        return "".join(c for c in text if c in self._c2i)

    def encode(self, text: str, max_len: int) -> Tuple[np.ndarray, int]:
        """-> (int32[max_len] padded with 0, true length). Drops unknown chars."""
        ids = [self._c2i[c] for c in self.normalize(text)][:max_len]
        out = np.zeros((max_len,), dtype=np.int32)
        out[: len(ids)] = ids
        return out, len(ids)

    def encode_batch(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        labels = np.zeros((len(texts), max_len), dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, t in enumerate(texts):
            labels[i], lengths[i] = self.encode(t, max_len)
        return labels, lengths

    def decode(self, ids: Sequence[int]) -> str:
        """Plain index->char lookup (no CTC collapse; see ops.ctc decoders)."""
        return "".join(self._i2c.get(int(i), self.unknown_as) for i in ids if int(i) != self.BLANK)

    def decode_batch(self, ids: np.ndarray, lengths: np.ndarray) -> List[str]:
        return [self.decode(row[: int(n)]) for row, n in zip(np.asarray(ids), np.asarray(lengths))]


@register
class AttentionCharset(Charset):
    """Charset for attentional decoders: adds GO/EOS/PAD control tokens.

    Layout: 0=PAD, 1=GO, 2=EOS, chars from 3. (CTC blank convention does not
    apply here; index 0 doubles as padding.)
    """

    PAD, GO, EOS = 0, 1, 2
    NUM_SPECIAL = 3

    def __init__(self, alphabet: str = DEFAULT_ALPHABET, case_sensitive: bool = False):
        super().__init__(alphabet, case_sensitive)
        self._c2i = {c: i + self.NUM_SPECIAL for i, c in enumerate(self.alphabet)}
        self._i2c = {i + self.NUM_SPECIAL: c for i, c in enumerate(self.alphabet)}

    @property
    def num_classes(self) -> int:
        return len(self.alphabet) + self.NUM_SPECIAL

    def encode(self, text: str, max_len: int) -> Tuple[np.ndarray, int]:
        """-> ids terminated by EOS then PAD; length includes the EOS."""
        ids = [self._c2i[c] for c in self.normalize(text)][: max_len - 1]
        ids.append(self.EOS)
        out = np.full((max_len,), self.PAD, dtype=np.int32)
        out[: len(ids)] = ids
        return out, len(ids)

    def decode(self, ids: Sequence[int]) -> str:
        chars = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i >= self.NUM_SPECIAL:
                chars.append(self._i2c.get(i, ""))
        return "".join(chars)
