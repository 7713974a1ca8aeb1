"""CLIP byte-level BPE tokenizer (pure Python, NumPy output).

Token-for-token compatible with the reference tokenizer
(/root/reference/utils/simple_tokenizer.py:62-127 and the ``tokenize``
wrapper at /root/reference/utils/dataset.py:43-84): lower-cased, byte-level
BPE over the 49,408-entry CLIP vocabulary, with <|startoftext|> /
<|endoftext|> wrapping and zero-padding to a fixed length.

``ftfy`` is optional here: RefCOCO expressions are plain ASCII, so the
fallback (NFC normalization + double html-unescape + strip) is equivalent
for the supported datasets.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import List, Sequence, Union

import numpy as np
import regex as re

try:  # pragma: no cover - exercised only when ftfy is installed
    import ftfy

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)

except ImportError:  # pragma: no cover

    def _fix_text(text: str) -> str:
        return unicodedata.normalize("NFC", text)


@functools.lru_cache()
def default_bpe_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bpe_simple_vocab_16e6.txt.gz"
    )


@functools.lru_cache()
def byte_unicode_table():
    """Invertible uint8 byte -> printable unicode char mapping.

    The standard GPT-2/CLIP trick: printable latin bytes map to themselves,
    the remaining byte values are shifted into the 256+ codepoint range so
    the BPE vocabulary never contains raw whitespace/control characters.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    # Insertion order matters: printable bytes first (that ordering defines
    # the first 256 vocab entries), then the shifted ones.
    out = {b: chr(b) for b in keep}
    shifted = 0
    for b in range(256):
        if b not in out:
            out[b] = chr(256 + shifted)
            shifted += 1
    return out


def _clean_text(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipBPETokenizer:
    """Byte-level BPE with the CLIP merge table."""

    SOT = "<|startoftext|>"
    EOT = "<|endoftext|>"

    def __init__(self, bpe_path: str | None = None):
        bpe_path = bpe_path or default_bpe_path()
        self.byte_encoder = byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path) as f:
            merge_lines = f.read().decode("utf-8").split("\n")
        # Same slice as CLIP: skip the header line, keep exactly enough merges
        # for a 49,408-entry vocab (256 bytes + 256 byte</w> + merges + 2).
        merge_lines = merge_lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [self.SOT, self.EOT]

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {self.SOT: self.SOT, self.EOT: self.EOT}
        self._word_pattern = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    @property
    def sot_token(self) -> int:
        return self.encoder[self.SOT]

    @property
    def eot_token(self) -> int:
        return self.encoder[self.EOT]

    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>"

        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)

        result = " ".join(word)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = _clean_text(text).lower()
        for word in re.findall(self._word_pattern, text):
            word = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            tokens.extend(
                self.encoder[piece] for piece in self._bpe(word).split(" ")
            )
        return tokens

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer() -> ClipBPETokenizer:
    return ClipBPETokenizer()


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = 77,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize text(s) to a fixed-length int32 array.

    Wraps each text in SOT/EOT, zero-pads to ``context_length``; when
    truncating, the final token is forced to EOT. Matches
    /root/reference/utils/dataset.py:43-84 (int32 instead of int64: CLIP
    vocab ids fit comfortably and TPUs prefer 32-bit integers).
    """
    if isinstance(texts, str):
        texts = [texts]
    tk = get_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = [tk.sot_token] + tk.encode(text) + [tk.eot_token]
        if len(tokens) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length "
                    f"{context_length}"
                )
            tokens = tokens[:context_length]
            tokens[-1] = tk.eot_token
        result[i, : len(tokens)] = tokens
    return result
