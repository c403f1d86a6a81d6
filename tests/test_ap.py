import numpy as np
import pytest

from odc_tpu.core.ap import APAccumulator, iou_np


class _StubModel:
    """Feeds canned predictions to the reference evaluate_model oracle."""

    def __init__(self, cls_list, preds):
        self.cls_list = cls_list
        self._preds = list(preds)
        self._i = 0

    def detect(self, img, conf_score_thre, iou_thre):
        p = self._preds[self._i]
        self._i += 1
        return p


def _random_case(seed, n_imgs=6, cls_list=("cat", "dog", "bird")):
    rng = np.random.default_rng(seed)
    dataset, preds = [], []
    for i in range(n_imgs):
        g = rng.integers(1, 4)
        gt_boxes = rng.uniform(0, 80, (g, 4))
        gt_boxes[:, 2:] = gt_boxes[:, :2] + rng.uniform(10, 40, (g, 2))
        gt_lbls = [cls_list[k] for k in rng.integers(0, len(cls_list), g)]
        dataset.append(
            (i, None, {"bbox_list": gt_boxes.tolist(), "lbl_list": gt_lbls})
        )
        p = rng.integers(0, 5)
        # Predictions: some jittered copies of GTs, some random.
        pb, pl, ps = [], [], []
        for _ in range(p):
            if rng.random() < 0.6 and g:
                j = rng.integers(0, g)
                box = gt_boxes[j] + rng.normal(0, 4, 4)
                lbl = gt_lbls[j] if rng.random() < 0.8 else cls_list[
                    rng.integers(0, len(cls_list))
                ]
            else:
                box = rng.uniform(0, 80, 4)
                box[2:] = box[:2] + rng.uniform(10, 40, 2)
                lbl = cls_list[rng.integers(0, len(cls_list))]
            pb.append(box.tolist())
            pl.append(lbl)
            ps.append(float(rng.random()))
        preds.append(
            {
                "bbox_list": pb,
                "lbl_list": pl,
                "conf_score_list": ps,
                "cls_spec_conf_score_list": ps,
            }
        )
    return dataset, preds, list(cls_list)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_reference_evaluate_model(reference_utils, seed):
    dataset, preds, cls_list = _random_case(seed)
    stub = _StubModel(cls_list, preds)
    ref = reference_utils.evaluate_model(stub, dataset, ckpt_path=None)

    acc = APAccumulator(cls_list)
    for (_, _, annot), pred in zip(dataset, preds):
        acc.add_image(
            np.asarray(pred["bbox_list"], np.float64).reshape(-1, 4),
            pred["lbl_list"],
            np.asarray(pred["cls_spec_conf_score_list"], np.float64),
            np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4),
            annot["lbl_list"],
        )
    ours = acc.result()

    np.testing.assert_allclose(ours["level_list"], ref["level_list"])
    for c in cls_list:
        np.testing.assert_allclose(ours[c], ref[c], rtol=1e-9, err_msg=c)


def test_no_dedup_counts_duplicates_as_tp():
    # Two confident detections of the same GT: reference rule -> both TP.
    gt = np.array([[0, 0, 10, 10]], np.float64)
    preds = np.array([[0, 0, 10, 10], [0.5, 0, 10.5, 10]], np.float64)

    acc = APAccumulator(["x"], levels=[0.5])
    acc.add_image(preds, ["x", "x"], np.array([0.9, 0.8]), gt, ["x"])
    res = acc.result()
    assert res["x"][0] > 1.0  # recall exceeds 1 (tp_cum=2, num_gt=1)

    acc2 = APAccumulator(["x"], levels=[0.5], dedup=True)
    acc2.add_image(preds, ["x", "x"], np.array([0.9, 0.8]), gt, ["x"])
    res2 = acc2.result()
    assert res2["x"][0] == pytest.approx(1.0, abs=1e-5)


def test_perfect_detections_ap_one():
    rng = np.random.default_rng(0)
    acc = APAccumulator(["a", "b"], dedup=True)
    for _ in range(4):
        g = rng.integers(1, 3)
        boxes = rng.uniform(0, 50, (g, 4))
        boxes[:, 2:] = boxes[:, :2] + 20
        lbls = ["a" if rng.random() < 0.5 else "b" for _ in range(g)]
        acc.add_image(boxes, lbls, np.ones(g), boxes, lbls)
    m = acc.mean_ap()
    assert m["mAP"] == pytest.approx(1.0, abs=1e-5)


def test_missed_class_zero_ap():
    acc = APAccumulator(["a", "b"])
    acc.add_image(
        np.zeros((0, 4)), [], np.zeros(0),
        np.array([[0, 0, 10, 10.0]]), ["b"],
    )
    res = acc.result()
    assert np.all(res["b"] == 0)


def test_iou_np_matches_core():
    import jax.numpy as jnp
    from odc_tpu.core.boxes import iou

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 50, (10, 4))
    a[:, 2:] += a[:, :2]
    b = rng.uniform(0, 50, (10, 4))
    b[:, 2:] += b[:, :2]
    np.testing.assert_allclose(
        iou_np(a, b), np.asarray(iou(jnp.asarray(a), jnp.asarray(b))),
        rtol=1e-4, atol=1e-6,
    )


def test_legacy_grid_aps_matches_reference(reference_utils):
    from odc_tpu.core.ap import legacy_grid_aps

    rng = np.random.default_rng(11)
    n, s, b, c = 12, 3, 2, 4
    iou = rng.uniform(0, 1, (n, s, s, b))
    cls_tgt = np.eye(c)[rng.integers(0, c, n)]
    cls_score = rng.uniform(0, 1, (n, s, s, b, c))
    img_id = rng.integers(0, 5, n)

    ours = legacy_grid_aps(iou, cls_tgt, cls_score, img_id)
    ref = reference_utils.get_aps(iou, cls_tgt, cls_score, img_id)

    levels = [.5, .55, .6, .65, .7, .75, .8, .85, .9, .95]
    for lev in levels:
        np.testing.assert_allclose(ours[lev], ref[lev], rtol=1e-12)
    np.testing.assert_allclose(ours["mAP"], ref["mAP"], rtol=1e-12)
