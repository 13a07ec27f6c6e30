"""Segmentation QUALITY gates (VERDICT round-1 item 3): the semantic stack
must be measurably real, not structurally-complete noise.

 * `test_geometric_masks_iou` — the default (weights-free) geometric mask
   generator reaches mean best-match IoU > 0.5 against ground-truth
   instances on the synthetic scene.
 * `test_objects_channels_classify_back` — training the map + classifier on
   ground-truth masks makes the RENDERED 16-channel object features classify
   back to the ground-truth labels (the end-to-end contract of the
   reference's semantic path, `scripts/gaussian_splatting.py:493-580,798-826`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sags_tpu.io.datasets import SyntheticDataset
from sags_tpu.semantics.geometric import GeometricMaskGenerator


def _best_match_iou(gt: np.ndarray, pred: np.ndarray, min_area: int = 50):
    """For each GT instance, IoU of the best-overlapping predicted label."""
    ious = []
    for g in np.unique(gt):
        if g == 0:
            continue
        gm = gt == g
        if gm.sum() < min_area:
            continue
        labels, counts = np.unique(pred[gm], return_counts=True)
        best = labels[np.argmax(counts)]
        pm = pred == best
        ious.append((gm & pm).sum() / max((gm | pm).sum(), 1))
    return float(np.mean(ious)) if ious else 0.0


def test_geometric_masks_iou():
    ds = SyntheticDataset(n_frames=3, width=160, height=120, n_world=8192,
                          pts_per_frame=1024, clutter=0.4, seed=2)
    gen = GeometricMaskGenerator(n_clusters=12, work_size=120, seed=0)
    scores = []
    for i, frame in enumerate(ds):
        gt = ds.gt_objects(i)
        pred = gen.generate_objects(frame.image, frame.depth)
        scores.append(_best_match_iou(gt, pred))
    mean_iou = float(np.mean(scores))
    assert mean_iou > 0.5, f"geometric segmentation mean IoU {mean_iou:.3f}"


def test_objects_channels_classify_back():
    from sags_tpu.core.config import MapConfig, RasterizeConfig, SLAMConfig
    from sags_tpu.models.classifier import apply_classifier
    from sags_tpu.slam import step as slam

    ds = SyntheticDataset(n_frames=1, width=96, height=96, n_world=4096,
                          pts_per_frame=4096, clutter=0.4, seed=3)
    frame = next(iter(ds))
    gt = ds.gt_objects(0)  # instance ids double as class labels here

    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256,
                               chunk=64, windowed=False),
        map=MapConfig(initial_capacity=8192, prune_interval=10_000),
    )
    state = slam.init_state(cfg, jax.random.key(0))
    add = slam.make_add_points(cfg, donate=False)
    state, _ = add(state, jnp.asarray(frame.points), jnp.asarray(frame.colors),
                   jnp.ones(len(frame.points), bool))
    cam = ds.camera(0)
    img = jnp.asarray(frame.image)
    obj = jnp.asarray(gt.astype(np.int32))
    stepfn = slam.make_slam_step(cfg, donate=False)
    for _ in range(250):
        state, metrics = stepfn(state, cam, img, obj)

    out = slam.render_map(state.map, cam, cfg)
    logits = apply_classifier(state.classifier, out.objects)
    pred = np.asarray(jnp.argmax(logits, axis=0))
    fg = gt > 0
    acc = float((pred[fg] == gt[fg]).mean())
    assert acc > 0.6, f"rendered-objects classification accuracy {acc:.3f}"


def test_trained_sam_beats_random_on_heldout():
    """The shipped synthetic-data-trained SAM weights (models/sam_train.py)
    must beat random init by a wide margin on a HELD-OUT synthetic world
    (seed not in the training set), box-prompted at the decoder's native
    64x64 canvas resolution. Guards against shipping stale/broken weights."""
    import os

    from sags_tpu.models.sam import SAM, PromptEncoder
    from sags_tpu.models.sam_train import (
        WEIGHTS_PATH, load_pretrained, make_training_data,
    )

    if not os.path.exists(WEIGHTS_PATH):
        pytest.skip("no shipped SAM weights")

    data = make_training_data(seeds=(7,), frames_per_world=2)
    assert len(data) >= 4
    imgs = jnp.asarray(np.stack([d[0] for d in data]))
    boxes = jnp.asarray(np.stack([d[1] for d in data]))
    gts = np.stack([d[2] for d in data]) > 0.5

    def iou_per_example(sam):
        emb = sam.encoder.apply(sam.params.encoder, imgs)
        sparse = sam.prompt_encoder.apply(sam.params.prompt, boxes)
        pe = sam.prompt_encoder.apply(
            sam.params.prompt, method=PromptEncoder.get_dense_pe
        )
        logits = sam.mask_decoder.apply(sam.params.decoder, emb, pe, sparse)[:, 0]
        pred = np.asarray(logits) > 0.0
        inter = (pred & gts).sum((1, 2))
        union = np.maximum((pred | gts).sum((1, 2)), 1)
        return inter / union

    areas = gts.sum((1, 2))
    big = areas >= 100  # instances resolvable by the 16x16-patch encoder
    assert big.sum() >= 3

    random_sam = SAM()
    iou_rand = float(np.mean(iou_per_example(random_sam)))
    trained = SAM()
    assert load_pretrained(trained)
    per = iou_per_example(trained)
    iou_big = float(np.mean(per[big]))
    iou_all = float(np.mean(per))
    assert iou_big > 0.5, f"large-instance IoU {iou_big:.3f}"
    assert iou_all > iou_rand + 0.2, (iou_all, iou_rand)


def test_geometric_masks_iou_textured():
    """Textured worlds (per-instance world-space modulation): the geometric
    generator must hold its IoU floor when instances are NOT flat color
    patches — the distribution round-2's blob-only evidence skipped."""
    ds = SyntheticDataset(n_frames=3, width=160, height=120, n_world=8192,
                          pts_per_frame=1024, clutter=0.4, seed=2,
                          texture=0.5)
    gen = GeometricMaskGenerator(n_clusters=12, work_size=120, seed=0)
    scores = []
    for i, frame in enumerate(ds):
        gt = ds.gt_objects(i)
        pred = gen.generate_objects(frame.image, frame.depth)
        scores.append(_best_match_iou(gt, pred))
    mean_iou = float(np.mean(scores))
    assert mean_iou > 0.45, f"textured geometric IoU {mean_iou:.3f}"


def test_geometric_masks_iou_degraded():
    """Domain-randomized inputs (sensor noise, exposure/gamma jitter, blur,
    JPEG round-trip — semantics/domain_rand.py): the geometric generator
    must hold a floor on textured worlds under full-strength distortion.
    Measured clean textured IoU is ~0.47-0.50; the randomized bar is 0.40
    (round-3 VERDICT weak #4: gates ran only on the cleanest distribution)."""
    from sags_tpu.semantics.domain_rand import domain_randomize

    ds = SyntheticDataset(n_frames=3, width=160, height=120, n_world=8192,
                          pts_per_frame=1024, clutter=0.4, seed=2,
                          texture=0.5)
    gen = GeometricMaskGenerator(n_clusters=12, work_size=120, seed=0)
    rng = np.random.default_rng(0)
    scores = []
    for i, frame in enumerate(ds):
        gt = ds.gt_objects(i)
        img = domain_randomize(frame.image, rng, strength=1.0)
        pred = gen.generate_objects(img, frame.depth)
        scores.append(_best_match_iou(gt, pred))
    mean_iou = float(np.mean(scores))
    assert mean_iou > 0.40, f"degraded geometric IoU {mean_iou:.3f}"


def test_trained_sam_holds_iou_on_degraded_heldout():
    """The shipped SAM weights under full-strength domain randomization on a
    textured HELD-OUT world: large-instance IoU must stay above the same 0.5
    bar as the clean gate (measured ~0.69 degraded vs ~0.70 clean — the
    box-prompted decoder is robust to photometric distortion)."""
    import os

    from sags_tpu.models.sam import SAM, PromptEncoder
    from sags_tpu.models.sam_train import (
        WEIGHTS_PATH, load_pretrained, make_training_data,
    )
    from sags_tpu.semantics.domain_rand import domain_randomize

    if not os.path.exists(WEIGHTS_PATH):
        pytest.skip("no shipped SAM weights")

    data = make_training_data(seeds=(8,), frames_per_world=2, texture=0.5)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(np.stack([
        domain_randomize(d[0].transpose(2, 0, 1), rng,
                         strength=1.0).transpose(1, 2, 0)
        for d in data
    ]))
    boxes = jnp.asarray(np.stack([d[1] for d in data]))
    gts = np.stack([d[2] for d in data]) > 0.5

    sam = SAM()
    assert load_pretrained(sam)
    emb = sam.encoder.apply(sam.params.encoder, imgs)
    sparse = sam.prompt_encoder.apply(sam.params.prompt, boxes)
    pe = sam.prompt_encoder.apply(
        sam.params.prompt, method=PromptEncoder.get_dense_pe
    )
    logits = sam.mask_decoder.apply(sam.params.decoder, emb, pe, sparse)[:, 0]
    pred = np.asarray(logits) > 0.0
    inter = (pred & gts).sum((1, 2))
    union = np.maximum((pred | gts).sum((1, 2)), 1)
    per = inter / union
    areas = gts.sum((1, 2))
    big = areas >= 100
    assert big.sum() >= 3
    iou_big = float(np.mean(per[big]))
    assert iou_big > 0.5, f"degraded large-instance IoU {iou_big:.3f}"


def test_trained_sam_beats_random_on_textured_heldout():
    """The shipped SAM weights must also segment TEXTURED held-out worlds
    (trained on a flat+textured mix, models/sam_train.py): instance
    appearance varies inside each object, so flat-color matching can't
    solve it."""
    import os

    from sags_tpu.models.sam import SAM, PromptEncoder
    from sags_tpu.models.sam_train import (
        WEIGHTS_PATH, load_pretrained, make_training_data,
    )

    if not os.path.exists(WEIGHTS_PATH):
        pytest.skip("no shipped SAM weights")

    data = make_training_data(seeds=(8,), frames_per_world=2, texture=0.5)
    assert len(data) >= 4
    imgs = jnp.asarray(np.stack([d[0] for d in data]))
    boxes = jnp.asarray(np.stack([d[1] for d in data]))
    gts = np.stack([d[2] for d in data]) > 0.5

    def iou_per_example(sam):
        emb = sam.encoder.apply(sam.params.encoder, imgs)
        sparse = sam.prompt_encoder.apply(sam.params.prompt, boxes)
        pe = sam.prompt_encoder.apply(
            sam.params.prompt, method=PromptEncoder.get_dense_pe
        )
        logits = sam.mask_decoder.apply(sam.params.decoder, emb, pe, sparse)[:, 0]
        pred = np.asarray(logits) > 0.0
        inter = (pred & gts).sum((1, 2))
        union = np.maximum((pred | gts).sum((1, 2)), 1)
        return inter / union

    areas = gts.sum((1, 2))
    big = areas >= 100
    assert big.sum() >= 3

    iou_rand = float(np.mean(iou_per_example(SAM())))
    trained = SAM()
    assert load_pretrained(trained)
    per = iou_per_example(trained)
    iou_big = float(np.mean(per[big]))
    assert iou_big > 0.5, f"textured large-instance IoU {iou_big:.3f}"
    assert float(np.mean(per)) > iou_rand + 0.2
