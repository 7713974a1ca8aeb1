"""Reference-format LMDB shard reader (optional dependency).

Reads the LMDB layout written by /root/reference/tools/folder2lmdb.py:36-68
(keys '0','1',... plus __keys__/__len__). The released writer serializes
with pickle protocol 5 while the released reader calls the long-removed
pyarrow.deserialize (SURVEY.md §2-C10 latent mismatch); this reader tries
pickle first and falls back to pyarrow's legacy API when present.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict


def _loads(buf: bytes) -> Any:
    try:
        return pickle.loads(buf)
    except Exception:
        import pyarrow as pa  # legacy shards serialized by pa.serialize

        return pa.deserialize(buf)  # pragma: no cover


class LmdbBackend:
    """Lazy-opening LMDB reader (handles are not fork/thread safe to share,
    same rationale as utils/dataset.py:113-131)."""

    def __init__(self, lmdb_dir: str, expected_len: int | None = None):
        import lmdb  # noqa: F401  (fail fast if missing)

        self.lmdb_dir = lmdb_dir
        self._env = None
        self._keys = None
        self._len = expected_len

    def _ensure_open(self):
        if self._env is not None:
            return
        import lmdb

        self._env = lmdb.open(
            self.lmdb_dir,
            subdir=os.path.isdir(self.lmdb_dir),
            readonly=True,
            lock=False,
            readahead=False,
            meminit=False,
        )
        with self._env.begin(write=False) as txn:
            self._len = _loads(txn.get(b"__len__"))
            self._keys = _loads(txn.get(b"__keys__"))

    def __len__(self) -> int:
        if self._len is None:
            self._ensure_open()
        return self._len

    def __getitem__(self, index: int) -> Dict[str, Any]:
        self._ensure_open()
        with self._env.begin(write=False) as txn:
            buf = txn.get(self._keys[index])
        return _loads(buf)
