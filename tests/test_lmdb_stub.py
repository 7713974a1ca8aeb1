"""Execute the LMDB backend's decode logic without a real lmdb install.

`lmdb` is an optional dependency (not present in CI); until now
cris_tpu/data/lmdb_backend.py was only covered by code inspection
(VERDICT r2 weak #7). These tests drive the reader, the RefDataset
resolution path, and the tools/folder2pack.py --from-lmdb converter
through a stub `lmdb` module whose transactions serve records serialized
exactly as the reference writer does (/root/reference/tools/folder2lmdb.py:
26-66 -- pickle protocol 5, ascii int keys, __keys__/__len__ metadata).
The pyarrow legacy fallback in _loads is exercised via a stub pyarrow.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from cris_tpu.data import RefDataset, RefPackReader, make_record


class _StubTxn:
    def __init__(self, kv):
        self._kv = kv

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def get(self, key):
        return self._kv.get(key)


class _StubEnv:
    def __init__(self, kv):
        self._kv = kv

    def begin(self, write=False):
        assert write is False, "reader must open read-only transactions"
        return _StubTxn(self._kv)


def _reference_format_kv(records):
    """Serialize records exactly like the reference folder2lmdb writer."""
    kv = {}
    keys = []
    for idx, rec in enumerate(records):
        key = "{}".format(idx).encode("ascii")
        kv[key] = pickle.dumps(rec, protocol=5)
        keys.append(key)
    kv[b"__keys__"] = pickle.dumps(keys, protocol=5)
    kv[b"__len__"] = pickle.dumps(len(keys), protocol=5)
    return kv


@pytest.fixture()
def stub_lmdb(monkeypatch):
    """Install a fake `lmdb` module serving reference-format records."""
    records = [make_record(i, seed=11) for i in range(5)]
    kv = _reference_format_kv(records)
    calls = {}

    def open_(path, subdir=None, readonly=None, lock=None, readahead=None,
              meminit=None, **kw):
        calls["path"] = path
        assert readonly is True
        return _StubEnv(kv)

    mod = types.ModuleType("lmdb")
    mod.open = open_
    monkeypatch.setitem(sys.modules, "lmdb", mod)
    return records, calls


def test_lmdb_backend_reads_reference_format(stub_lmdb):
    from cris_tpu.data.lmdb_backend import LmdbBackend

    records, calls = stub_lmdb
    backend = LmdbBackend("datasets/lmdb/refcoco/train.lmdb")
    assert backend._env is None, "open must be lazy (fork/thread safety)"
    assert len(backend) == 5
    assert calls["path"] == "datasets/lmdb/refcoco/train.lmdb"
    for i in range(5):
        assert backend[i] == records[i]


def test_lmdb_backend_expected_len_defers_open(stub_lmdb):
    from cris_tpu.data.lmdb_backend import LmdbBackend

    backend = LmdbBackend("train.lmdb", expected_len=5)
    assert len(backend) == 5
    assert backend._env is None, "len() with expected_len must not open"


def test_dataset_train_mode_over_lmdb_uri(stub_lmdb):
    ds = RefDataset("stub/train.lmdb", None, "stub", "train", "train",
                    416, 17)
    assert len(ds) == 5
    sample = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert sample["image"].shape == (416, 416, 3)
    assert sample["word"].shape == (17,)
    assert sample["mask"].shape == (416, 416, 1)


def test_folder2pack_from_lmdb(stub_lmdb, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    try:
        from folder2pack import lmdb2pack
    finally:
        sys.path.pop(0)

    records, _ = stub_lmdb
    lmdb2pack("datasets/lmdb/refcoco/train.lmdb", str(tmp_path))
    reader = RefPackReader(str(tmp_path / "train.refpack"))
    assert len(reader) == 5
    for i in range(5):
        assert reader[i] == records[i]
    reader.close()


def test_loads_pyarrow_legacy_fallback(monkeypatch):
    from cris_tpu.data import lmdb_backend

    seen = {}

    def deserialize(buf):
        seen["buf"] = bytes(buf)
        return {"seg_id": 1}

    mod = types.ModuleType("pyarrow")
    mod.deserialize = deserialize
    monkeypatch.setitem(sys.modules, "pyarrow", mod)
    # pa.serialize output is not a pickle stream: pickle.loads must raise
    # and the loader must hand the buffer to pyarrow.deserialize unchanged
    legacy = b"\x00\x00\x00\x00not-a-pickle"
    assert lmdb_backend._loads(legacy) == {"seg_id": 1}
    assert seen["buf"] == legacy
