"""FSST string compression (Boncz, Neumann, Freitag — VLDB 2020), pure Python.

Public-paper algorithm, re-implemented from the published description:
train a table of <=255 symbols (1..8 bytes) on a sample by iterative
pair-merging of the current greedy parse; encode greedily
longest-match; code 255 is the escape marker for bytes not covered by
a symbol.

Speed notes (SURVEY.md §7 hard part a): encoding is done with a
compiled ``re`` alternation sorted by descending symbol length — the
match loop runs in C, Python is only invoked once per emitted symbol.
Decoding is fully vectorized numpy (symbol-table gather + ragged mask
ravel), including escape handling.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
ESCAPE = 255
_TRAIN_SAMPLE = 16 * 1024
_TRAIN_ITERS = 4


def _compile(symbols: list[bytes]) -> re.Pattern:
    # Longest alternatives first: Python re tries alternatives left to
    # right at each position, which yields greedy longest-match parsing.
    alts = sorted(symbols, key=len, reverse=True)
    pat = b"|".join(re.escape(s) for s in alts) + (b"|" if alts else b"") + b"(?s:.)"
    return re.compile(pat, re.DOTALL)


def train(sample: bytes, iters: int = _TRAIN_ITERS) -> list[bytes]:
    """Iterative pair-merge training on a bounded sample."""
    sample = sample[:_TRAIN_SAMPLE]
    if not sample:
        return []
    # round 0: frequent single bytes
    counts = Counter(sample)
    symbols = [bytes([b]) for b, _ in counts.most_common(MAX_SYMBOLS)]
    for _ in range(iters):
        pat = _compile(symbols)
        parse = pat.findall(sample)
        gain: Counter[bytes] = Counter()
        for tok in parse:
            gain[tok] += len(tok)
        for a, b in zip(parse, parse[1:]):
            cat = a + b
            if len(cat) <= MAX_SYMBOL_LEN:
                gain[cat] += len(cat)
        # keep symbols worth their table slot; singles ensure coverage
        best = [s for s, _ in gain.most_common(MAX_SYMBOLS)]
        symbols = best
    return symbols


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        self._pat = _compile(symbols)
        self._code = {s: bytes([i]) for i, s in enumerate(symbols)}
        # decode gather table: (256, 8) byte matrix + lengths
        self._mat = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
        self._len = np.zeros(256, dtype=np.int64)
        for i, s in enumerate(symbols):
            self._mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            self._len[i] = len(s)

    def serialize(self) -> bytes:
        out = [bytes([len(self.symbols)])]
        for s in self.symbols:
            out.append(bytes([len(s)]))
            out.append(s)
        return b"".join(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "SymbolTable":
        n = blob[0]
        pos = 1
        symbols = []
        for _ in range(n):
            ln = blob[pos]
            symbols.append(blob[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        return cls(symbols)

    def encode(self, data: bytes) -> bytes:
        code = self._code

        def repl(m: re.Match) -> bytes:
            s = m.group(0)
            c = code.get(s)
            return c if c is not None else bytes((ESCAPE, s[0]))

        return self._pat.sub(repl, data)

    def decode(self, payload: bytes) -> bytes:
        if not payload:
            return b""
        codes = np.frombuffer(payload, dtype=np.uint8)
        lens = self._len[codes]
        mat = self._mat[codes]
        esc = codes == ESCAPE
        if esc.any():
            # Maximal runs of ESCAPE bytes alternate marker/literal from
            # the run start (a marker always consumes the next byte, and
            # only ESCAPE can be a marker — see codecs/fsst.py docstring).
            idx = np.flatnonzero(esc)
            run_start = np.flatnonzero(np.diff(idx, prepend=-2) > 1)
            starts = idx[run_start]
            run_id = np.cumsum(np.diff(idx, prepend=-2) > 1) - 1
            offset_in_run = idx - starts[run_id]
            markers = idx[offset_in_run % 2 == 0]
            lens = lens.copy()
            mat = mat.copy()
            lens[markers] = 1
            mat[markers, 0] = codes[markers + 1]
            # consumed literal positions emit nothing (this also zeroes
            # literal positions whose value happens to be a symbol code)
            lens[markers + 1] = 0
        out = mat[np.arange(MAX_SYMBOL_LEN)[None, :] < lens[:, None]]
        return out.tobytes()


class Fsst:
    """Codec adapter: operates on (lengths, concat-bytes) string parts."""

    name = "fsst"
    kind = "str"

    def estimate_bytes(self, sample: bytes, total_bytes: int) -> float:
        table = SymbolTable(train(sample))
        probe = sample[:4096]
        if not probe:
            return float(total_bytes)
        ratio = len(table.encode(probe)) / len(probe)
        return ratio * total_bytes + len(table.serialize())

    def encode_bytes(self, data: bytes, table: SymbolTable | None = None):
        if table is None:
            table = SymbolTable(train(data))
        return table, table.encode(data)

    def decode_bytes(self, table_blob: bytes, payload: bytes) -> bytes:
        return SymbolTable.deserialize(table_blob).decode(payload)
