"""End-to-end eval-path tests with synthetic data (no training needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_cris


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_cris(dropout=0.0)
    img = jnp.zeros((2, 64, 64, 3), jnp.float32)
    word = jnp.zeros((2, 17), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, word)
    return model, variables


def test_validate_on_synthetic(model_and_vars):
    from cris_tpu.data import RefDataLoader, RefDataset
    from cris_tpu.engine import Evaluator

    model, variables = model_and_vars
    ds = RefDataset("synthetic://6?seed=9", None, "synthetic", "val", "val", 64, 17)
    loader = RefDataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    ev = Evaluator(model, input_size=64, batch_size=4)
    iou, prec = ev.validate(loader, variables, epoch=1, epochs=1)
    assert 0.0 <= iou <= 1.0
    assert set(prec) == {"Pr@50", "Pr@60", "Pr@70", "Pr@80", "Pr@90", "oIoU"}
    assert all(0.0 <= v <= 1.0 for v in prec.values())


def test_inference_all_sentences(model_and_vars, tmp_path):
    from cris_tpu.data import RefDataset
    from cris_tpu.engine import Evaluator

    model, variables = model_and_vars
    ds = RefDataset("synthetic://5?seed=10", None, "synthetic", "val", "test", 64, 17)
    ev = Evaluator(model, input_size=64, batch_size=4)
    vis_dir = str(tmp_path / "vis")
    import os

    os.makedirs(vis_dir)
    iou, prec = ev.inference(
        ds, variables, word_len=17, visualize=True, vis_dir=vis_dir, progress=False
    )
    assert 0.0 <= iou <= 1.0
    total_sents = sum(len(ds[i]["sents"]) for i in range(len(ds)))
    # every sentence produced one visualization (plus img+mask dumps)
    dumped = os.listdir(vis_dir)
    assert len([f for f in dumped if "-iou=" in f]) == total_sents


def test_validate_iou_perfect_when_fed_gt(tmp_path):
    """Feeding the evaluator's host chain a perfect prediction yields IoU~1:
    validates the inverse-warp + threshold + disk-mask path."""
    import cv2

    from cris_tpu.data import RefDataset
    from cris_tpu.data.transforms import inverse_warp_prediction
    from cris_tpu.engine.metrics import mask_iou

    ds = RefDataset("synthetic://3?seed=11", None, "synthetic", "val", "val", 416, 17)
    for i in range(3):
        s = ds[i]
        mask = cv2.imread(s["mask_path"], cv2.IMREAD_GRAYSCALE) / 255.0
        # forward-warp GT to input res (as the training mask path does)
        rec_mask = ds.backend[i]["mask"]
        from cris_tpu.data.transforms import decode_mask, get_transform_mats, warp_mask

        mat, inv = get_transform_mats(tuple(s["ori_size"]), (416, 416))
        warped = warp_mask(decode_mask(rec_mask), mat, (416, 416))
        # inverse-warp back and compare with disk mask
        back = inverse_warp_prediction(
            warped.astype(np.float32), inv, tuple(s["ori_size"])
        )
        iou = mask_iou(back > 0.35, mask)
        assert iou > 0.97, iou
