import os

import pytest

from cris_tpu.utils import load_cfg_from_cfg_file, merge_cfg_from_list

CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config",
    "refcoco",
    "cris_r50.yaml",
)


def test_load_flattens_sections():
    cfg = load_cfg_from_cfg_file(CFG)
    # Keys from every section live in one flat namespace.
    assert cfg.dataset == "refcoco"
    assert cfg.input_size == 416
    assert cfg.word_len == 17
    assert cfg.word_dim == 1024
    assert cfg.fpn_in == [512, 1024, 1024]
    assert cfg.fpn_out == [256, 512, 1024]
    assert cfg.num_layers == 3
    assert cfg.num_head == 8
    assert cfg.dim_ffn == 2048
    assert cfg.dropout == 0.1
    assert cfg.epochs == 50
    assert cfg.milestones == [35]
    assert cfg.batch_size == 64
    assert cfg.base_lr == 1e-4
    assert cfg.lr_multi == 0.1
    assert cfg.test_split == "val-test"
    assert cfg.sync_bn is True


def test_attr_and_dict_access_are_same():
    cfg = load_cfg_from_cfg_file(CFG)
    assert cfg["input_size"] == cfg.input_size
    cfg.input_size = 512
    assert cfg["input_size"] == 512


def test_opts_merge_types():
    cfg = load_cfg_from_cfg_file(CFG)
    merged = merge_cfg_from_list(
        cfg,
        [
            "TRAIN.input_size", "320",
            "TRAIN.base_lr", "0.001",
            "TRAIN.fpn_in", "[1, 2, 3]",
            "TEST.test_split", "testA",
            "TRAIN.sync_bn", "False",
        ],
    )
    assert merged.input_size == 320 and isinstance(merged.input_size, int)
    assert merged.base_lr == 0.001
    assert merged.fpn_in == [1, 2, 3]
    assert merged.test_split == "testA"
    assert merged.sync_bn is False
    # Original untouched (deepcopy semantics).
    assert cfg.input_size == 416


def test_opts_unknown_key_rejected():
    cfg = load_cfg_from_cfg_file(CFG)
    with pytest.raises(AssertionError):
        merge_cfg_from_list(cfg, ["TRAIN.nonexistent", "1"])


def test_opts_type_mismatch_rejected():
    cfg = load_cfg_from_cfg_file(CFG)
    with pytest.raises(ValueError):
        merge_cfg_from_list(cfg, ["TRAIN.input_size", "[416]"])


def test_all_eight_presets_load():
    root = os.path.dirname(CFG).rsplit(os.sep, 2)[0]
    count = 0
    for ds in ("refcoco", "refcoco+", "refcocog_u", "refcocog_g"):
        for arch in ("r50", "r101"):
            cfg = load_cfg_from_cfg_file(
                os.path.join(root, "config", ds, f"cris_{arch}.yaml")
            )
            assert cfg.dataset == ds
            expected_word_dim = 1024 if arch == "r50" else 512
            assert cfg.word_dim == expected_word_dim
            expected_len = 22 if ds.startswith("refcocog") else 17
            assert cfg.word_len == expected_len
            count += 1
    assert count == 8
