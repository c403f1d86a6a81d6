import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.data.voc import VOC, make_synthetic_voc
from odc_tpu.eval import Detector, evaluate_model, evaluate_batched
from odc_tpu.models import YOLOv2


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_eval")
    make_synthetic_voc(str(root), num_train=2, num_val=3, image_hw=(96, 128))
    voc = VOC(dataset_dir=str(root))
    model = YOLOv2(image_size=(96, 128))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 96, 128, 3), jnp.uint8)
    )
    return voc, model, variables


def test_detect_contract(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    _, img, _ = voc.val_dataset[0]
    pred = det.detect(img)
    assert set(pred) == {
        "bbox_list", "lbl_list", "conf_score_list",
        "cls_spec_conf_score_list",
    }
    n = len(pred["bbox_list"])
    assert len(pred["lbl_list"]) == n == len(pred["conf_score_list"])
    for box in pred["bbox_list"]:
        assert len(box) == 4


def test_evaluate_model_runs(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    res = evaluate_model(det, voc.val_dataset)
    assert "level_list" in res and len(res["level_list"]) == 10
    for c in det.cls_list:
        assert res[c].shape == (10,)
        assert np.all(np.isfinite(res[c]))


def test_evaluate_batched_runs(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    res = evaluate_batched(
        det, voc.val_dataset, image_hw=(96, 128), batch_size=2
    )
    assert "level_list" in res
    for c in det.cls_list:
        assert np.all(np.isfinite(res[c]))
