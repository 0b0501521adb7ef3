"""Cluster-wide codec choice registry (shared mutable state -> actor).

The per-(source, column) codec trial (``encode_array(trial=True)``:
every close candidate really encoded on the SAME chunk, winner kept)
must run ONCE per job, not once per worker.  This zero-CPU actor elects
one LEAD per key — the first worker to ask runs the trial on its chunk
and reports the winner; everyone else encodes with the sample-projected
best until the winner locks, then switches and caches it locally.

Same-chunk comparison is the only statistically valid one (per-chunk
size variance across different chunks exceeds the sub-1% codec deltas
— measured round 2), and lead election caps the trial's extra encode
passes at ~2 per key per JOB.  If a lead dies before reporting, the key
simply stays on the projected best — no deadlock, bounded size cost.

This registry is the one genuinely-shared mutable state in the encode
pipeline, which is exactly the case the Dataset API can't express and
a raw ``@ray.remote`` actor is for.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class CodecChoiceRegistry:
    _LEADING = "\x00leading"

    def __init__(self):
        self.state: dict = {}

    def ask(self, key) -> dict:
        """First caller per key becomes the trial lead; later callers get
        the winner once locked, else None (= use projected best)."""
        st = self.state.get(key)
        if st is None:
            self.state[key] = self._LEADING
            return {"lead": True, "winner": None}
        if st == self._LEADING:
            return {"lead": False, "winner": None}
        return {"lead": False, "winner": st}

    def set_winner(self, key, codec: str) -> None:
        self.state[key] = codec

    def choices(self) -> dict:
        """Debug/metrics view: key -> winner (None while trialing)."""
        return {k: (None if v == self._LEADING else v) for k, v in self.state.items()}
