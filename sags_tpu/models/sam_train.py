"""Train the flax SAM on synthetic instance data.

The reference ships pretrained MobileSAMv2 checkpoints loaded from absolute
paths (`scripts/gaussian_splatting.py:137-144,199-207`); those weights are
not vendored, so `models/sam.py` initializes randomly. This module makes the
learned path real: `SyntheticDataset` knows ground-truth instance identity
per world Gaussian (`io/datasets.py:gt_objects`), so we can supervise the
box→mask task directly — render frames across several procedural worlds,
extract (image, instance box, instance mask) triples, and train
encoder+prompt+decoder end-to-end with BCE+dice at the decoder's native
64×64 canvas resolution, with box-jitter augmentation.

Shipped weights: `sags_tpu/models/weights/sam_synth.pkl` (float16), produced
by `python -m sags_tpu.models.sam_train` (≈2 min on one TPU chip) and loaded
by `SAM.pretrained()` / `MaskGenerator` by default when present.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.models.sam import SAM, SAMParams

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights", "sam_synth.pkl")


def make_training_data(
    seeds=(0, 1, 2, 3),
    frames_per_world: int = 4,
    min_area: int = 64,
    size: int = 256,
    width: int = 160,
    height: int = 120,
    texture: float = 0.0,
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(canvas image [S,S,3], box xyxy [4] canvas px, mask [S/4,S/4] f32).

    `texture` > 0 renders TEXTURED worlds (per-instance world-space
    procedural modulation, `SyntheticDataset(texture=...)`) — instances stop
    being flat color patches, the distribution the blob-world shortcut
    exploits."""
    from sags_tpu.io.datasets import SyntheticDataset

    out = []
    G4 = size // 4
    for seed in seeds:
        ds = SyntheticDataset(
            n_frames=frames_per_world, width=width, height=height,
            seed=seed, clutter=0.3, texture=texture,
        )
        for i in range(frames_per_world):
            img, _depth = ds.render_gt(i)  # color [3,H,W], depth
            img = np.asarray(img, np.float32).transpose(1, 2, 0)
            inst = np.asarray(ds.gt_objects(i))  # [H,W] int
            H, W = inst.shape
            sc = size / max(H, W)
            nh, nw = int(round(H * sc)), int(round(W * sc))
            canvas = np.zeros((size, size, 3), np.float32)
            canvas[:nh, :nw] = np.asarray(
                jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bilinear")
            )
            for lab in np.unique(inst):
                if lab == 0:
                    continue
                m = inst == lab
                if m.sum() < min_area:
                    continue
                ys, xs = np.nonzero(m)
                box = np.array(
                    [xs.min() * sc, ys.min() * sc, (xs.max() + 1) * sc,
                     (ys.max() + 1) * sc], np.float32,
                )
                mc = np.asarray(jax.image.resize(
                    jnp.asarray(m, jnp.float32), (nh, nw), "bilinear"
                ))
                mcv = np.zeros((size, size), np.float32)
                mcv[:nh, :nw] = mc
                m4 = np.asarray(jax.image.resize(
                    jnp.asarray(mcv), (G4, G4), "bilinear"
                ))
                out.append((canvas, box, (m4 > 0.5).astype(np.float32)))
    return out


def _loss_fn(params: SAMParams, sam: SAM, imgs, boxes, masks):
    from sags_tpu.models.sam import MaskDecoder, PromptEncoder

    emb = sam.encoder.apply(params.encoder, imgs)  # [B,G,G,C]
    sparse = sam.prompt_encoder.apply(params.prompt, boxes)
    pe = sam.prompt_encoder.apply(params.prompt, method=PromptEncoder.get_dense_pe)
    logits = sam.mask_decoder.apply(params.decoder, emb, pe, sparse)[:, 0]
    # BCE with logits
    bce = jnp.mean(
        jnp.maximum(logits, 0) - logits * masks + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    # soft dice
    p = jax.nn.sigmoid(logits)
    inter = jnp.sum(p * masks, axis=(1, 2))
    dice = 1.0 - jnp.mean(
        (2 * inter + 1.0) / (jnp.sum(p, (1, 2)) + jnp.sum(masks, (1, 2)) + 1.0)
    )
    return bce + dice


def train_sam(
    sam: SAM,
    data,
    steps: int = 400,
    batch: int = 16,
    lr: float = 3e-4,
    seed: int = 0,
    jitter: float = 4.0,
    log_every: int = 50,
) -> SAM:
    import optax

    tx = optax.adam(lr)
    params = sam.params
    opt_state = tx.init(params)

    # The whole dataset lives in HBM (images as uint8, 4x smaller upload);
    # batches are device-side gathers. Host-slicing numpy images per step
    # costs ~12 MB of host->device transfer per batch — through a tunneled
    # device that was ~1 s/step, 50x the actual compute.
    imgs_all = jnp.asarray(
        np.clip(np.stack([d[0] for d in data]) * 255.0, 0, 255).astype(np.uint8))
    boxes_all = jnp.asarray(np.stack([d[1] for d in data]))
    masks_all = jnp.asarray(np.stack([d[2] for d in data]))

    @jax.jit
    def step(params, opt_state, idx, bjit):
        imgs = jnp.take(imgs_all, idx, axis=0).astype(jnp.float32) / 255.0
        boxes = jnp.take(boxes_all, idx, axis=0) + bjit
        masks = jnp.take(masks_all, idx, axis=0)
        loss, grads = jax.value_and_grad(_loss_fn)(params, sam, imgs, boxes, masks)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(data)
    for it in range(steps):
        idx = rng.integers(0, n, batch)
        bjit = rng.normal(0, jitter, (batch, 4)).astype(np.float32)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(idx), jnp.asarray(bjit),
        )
        if log_every and it % log_every == 0:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)
    sam.params = params
    return sam


def save_fp16(sam: SAM, path: str = WEIGHTS_PATH):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    half = jax.tree.map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype == np.float32 else np.asarray(x),
        sam.params,
    )
    with open(path, "wb") as f:
        pickle.dump(half, f)


def load_pretrained(sam: SAM, path: Optional[str] = None) -> bool:
    """Load SAM weights (fp16 on disk → fp32) if present. Returns success.

    Resolution order mirrors `SAGS_LPIPS_WEIGHTS`: an explicit `path` wins;
    else the `SAGS_SAM_WEIGHTS` env var (drop-in point for EXTERNAL
    real-photo-trained weights — the reference loads its photo-pretrained
    checkpoints from absolute paths, `scripts/gaussian_splatting.py:136-144`);
    else the shipped synthetic-trained `models/weights/sam_synth.pkl`."""
    if path is None:
        path = os.environ.get("SAGS_SAM_WEIGHTS") or WEIGHTS_PATH
    if not os.path.exists(path):
        return False
    with open(path, "rb") as f:
        half = pickle.load(f)
    sam.params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.asarray(x).dtype in (np.float16, np.float32) else jnp.asarray(x),
        half,
    )
    return True


def main():
    import sys

    cache = None
    for a in sys.argv[1:]:
        if a.startswith("--cache="):
            cache = a.split("=", 1)[1]
    if cache and os.path.exists(cache):
        z = np.load(cache)
        data = list(zip(z["imgs"], z["boxes"], z["masks"]))
        print(f"loaded {len(data)} cached examples from {cache}")
    else:
        print("building synthetic box->mask data (flat + textured worlds)...")
        data = make_training_data(seeds=(0, 1, 2, 3, 4, 5), frames_per_world=5)
        data += make_training_data(seeds=(10, 11, 12, 13, 14, 15),
                                   frames_per_world=5, texture=0.5)
        if "--no-augment" not in sys.argv:
            # domain-randomized copies (noise/exposure/blur/JPEG — the
            # distortions real keyframes carry; geometry-preserving, so the
            # box/mask labels transfer): every other example, full strength
            from sags_tpu.semantics.domain_rand import domain_randomize

            rng = np.random.default_rng(99)
            data += [
                (domain_randomize(img.transpose(2, 0, 1), rng,
                                  strength=1.0).transpose(1, 2, 0), box, m)
                for img, box, m in data[::2]
            ]
        print(f"{len(data)} instance examples")
        if cache:
            np.savez(
                cache,
                imgs=np.stack([d[0] for d in data]),
                boxes=np.stack([d[1] for d in data]),
                masks=np.stack([d[2] for d in data]),
            )
            print(f"cached to {cache}")
    if "--data-only" in sys.argv:
        return
    sam = SAM()
    steps = 800
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
    train_sam(sam, data, steps=steps)
    save_fp16(sam)
    print(f"saved {WEIGHTS_PATH}")


if __name__ == "__main__":
    main()
