"""SAM-style box-prompted mask generator in JAX/flax.

The reference depends on MobileSAMv2 whose submodule is **empty**
(`src/gaussian_splatting/MobileSAM/` — SURVEY.md §0.1); only the API used by
the SLAM node is visible (SURVEY.md §2.6, `scripts/gaussian_splatting.py:
136-144,493-580`). This module provides that contract, TPU-native:

  * `sam_model_registry` — named constructors (`'PromptGuidedDecoder'`,
    `'efficientvit_l2'`, `'vit_h'`) returning jit-friendly modules.
  * `ImageEncoder` — a compact ViT producing [C, H/16, W/16] embeddings
    (the encoder is swappable; only its output feeds the decoder).
  * `PromptEncoder` — box corner embeddings with random-Fourier positional
    encoding + learned corner-type embeddings; `get_dense_pe()`.
  * `MaskDecoder` — two-way transformer (token↔image cross-attention) +
    4× upscaling head + hypernetwork MLP, `multimask_output`-capable.
  * `SamPredictor` — `.set_image`, `.features`, `.transform.apply_boxes`,
    `.model.postprocess_masks` — the exact call pattern of
    `generate_objects` (`scripts/gaussian_splatting.py:530-580`).
  * `ResizeLongestSide` — the 256-px transform (`:41,209`).

Weights: random-initialized by default (the upstream checkpoint files
`ObjectAwareModel.pt` / `l2.pt` are absolute-path dependencies the reference
loads from disk, `scripts/gaussian_splatting.py:137-138,199-201`); a
`load_params`/`save_params` pair round-trips our own checkpoints. Downstream
only consumes (N,H,W) binary masks, so any box-mask provider plugs in via
the same interface (see `sags_tpu.semantics.masks`).
"""

from __future__ import annotations

import functools
import pickle
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MASK_THRESHOLD = 0.0  # `predictor.model.mask_threshold`


class ResizeLongestSide:
    """Coordinate/image transform to a square `target_length` canvas."""

    def __init__(self, target_length: int = 256):
        self.target_length = target_length

    def get_preprocess_shape(self, h: int, w: int) -> Tuple[int, int]:
        scale = self.target_length / max(h, w)
        return int(round(h * scale)), int(round(w * scale))

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """[H,W,3] uint8/float → resized [h',w',3] (bilinear, jax.image)."""
        h, w = image.shape[:2]
        nh, nw = self.get_preprocess_shape(h, w)
        out = jax.image.resize(jnp.asarray(image, jnp.float32), (nh, nw, 3),
                               method="bilinear")
        return np.asarray(out)

    def apply_boxes(self, boxes: np.ndarray, original_size) -> np.ndarray:
        """xyxy boxes from original image coords → canvas coords."""
        h, w = original_size
        nh, nw = self.get_preprocess_shape(h, w)
        boxes = np.asarray(boxes, np.float32).copy().reshape(-1, 2, 2)
        boxes[..., 0] *= nw / w
        boxes[..., 1] *= nh / h
        return boxes.reshape(-1, 4)


class ImageEncoder(nn.Module):
    """Compact ViT: patchify 16×16 → transformer blocks → [H/16, W/16, C]."""

    embed_dim: int = 160
    depth: int = 4
    num_heads: int = 4
    img_size: int = 256

    @nn.compact
    def __call__(self, x):  # [B,H,W,3] in [0,1]
        B, H, W, _ = x.shape
        x = nn.Conv(self.embed_dim, (16, 16), strides=(16, 16), name="patch")(x)
        h, w = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.img_size // 16, self.img_size // 16, self.embed_dim))
        x = x + pos[:, :h, :w]
        x = x.reshape(B, h * w, self.embed_dim)
        for i in range(self.depth):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(y, y)
            x = x + y
            y = nn.LayerNorm()(x)
            y = nn.Dense(self.embed_dim * 4)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.embed_dim)(y)
            x = x + y
        x = nn.LayerNorm()(x)
        return x.reshape(B, h, w, self.embed_dim)


class PromptEncoder(nn.Module):
    """Box prompts → sparse embeddings; dense PE grid for the decoder."""

    embed_dim: int = 160
    grid: int = 16  # embedding spatial size (256/16)

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        self.corner_embed = self.param(
            "corner_embed", nn.initializers.normal(0.02), (2, self.embed_dim)
        )

    def _pe(self, coords):  # coords in [0,1], [...,2]
        proj = 2 * jnp.pi * (coords @ self.pe_gaussian)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

    def __call__(self, boxes):  # [B,4] xyxy in canvas pixels (0..256)
        corners = boxes.reshape(-1, 2, 2) / 256.0
        emb = self._pe(corners)  # [B,2,C]
        emb = emb + self.corner_embed[None]
        return emb  # sparse embeddings [B,2,C]

    def get_dense_pe(self):
        y = (jnp.arange(self.grid) + 0.5) / self.grid
        x = (jnp.arange(self.grid) + 0.5) / self.grid
        gy, gx = jnp.meshgrid(y, x, indexing="ij")
        return self._pe(jnp.stack([gx, gy], -1))  # [G,G,C]


class TwoWayBlock(nn.Module):
    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, tokens, image):  # [B,T,C], [B,N,C]
        t = tokens + nn.MultiHeadDotProductAttention(self.num_heads)(tokens, tokens)
        t = nn.LayerNorm()(t)
        t = t + nn.MultiHeadDotProductAttention(self.num_heads)(t, image)
        t = nn.LayerNorm()(t)
        y = nn.Dense(self.embed_dim * 4)(t)
        t = t + nn.Dense(self.embed_dim)(nn.gelu(y))
        t = nn.LayerNorm()(t)
        img = image + nn.MultiHeadDotProductAttention(self.num_heads)(image, t)
        img = nn.LayerNorm()(img)
        return t, img


class MaskDecoder(nn.Module):
    """Two-way transformer decoder + upscaling + hypernetwork MLP."""

    embed_dim: int = 160
    num_multimask: int = 3
    depth: int = 2

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt=None,
                 multimask_output: bool = False):
        # image_embeddings [B,G,G,C]; sparse_prompt [B,T,C]
        B, G, _, C = image_embeddings.shape
        n_tokens = 1 + self.num_multimask
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (n_tokens, C)
        )
        tokens = jnp.concatenate(
            [jnp.tile(mask_tokens[None], (B, 1, 1)), sparse_prompt], axis=1
        )
        img = image_embeddings
        if dense_prompt is not None:
            img = img + dense_prompt
        img = (img + image_pe[None]).reshape(B, G * G, C)
        for _ in range(self.depth):
            tokens, img = TwoWayBlock(C)(tokens, img)
        img = img.reshape(B, G, G, C)
        # 4x upscale
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2))(img)
        up = nn.gelu(nn.LayerNorm()(up))
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2))(up)
        up = nn.gelu(up)  # [B,4G,4G,C/8]
        # hypernetwork per mask token
        hyper = nn.Dense(C // 8)(nn.gelu(nn.Dense(C)(tokens[:, :n_tokens])))
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)
        if multimask_output:
            return masks[:, 1:]
        return masks[:, :1]


class SAMParams(NamedTuple):
    encoder: Any
    prompt: Any
    decoder: Any


class SAM:
    """Bundled encoder/prompt/decoder with jitted apply fns."""

    def __init__(self, embed_dim: int = 160, img_size: int = 256, rng=None):
        self.img_size = img_size
        self.encoder = ImageEncoder(embed_dim=embed_dim, img_size=img_size)
        self.prompt_encoder = PromptEncoder(embed_dim=embed_dim, grid=img_size // 16)
        self.mask_decoder = MaskDecoder(embed_dim=embed_dim)
        self.mask_threshold = MASK_THRESHOLD
        rng = rng if rng is not None else jax.random.key(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy_img = jnp.zeros((1, img_size, img_size, 3))
        dummy_boxes = jnp.zeros((1, 4))
        enc_p = self.encoder.init(r1, dummy_img)
        pr_p = self.prompt_encoder.init(r2, dummy_boxes)
        dense_pe = self.prompt_encoder.apply(pr_p, method=PromptEncoder.get_dense_pe)
        dummy_emb = jnp.zeros((1, img_size // 16, img_size // 16, embed_dim))
        dummy_sparse = jnp.zeros((1, 2, embed_dim))
        dec_p = self.mask_decoder.init(r3, dummy_emb, dense_pe, dummy_sparse)
        self.params = SAMParams(enc_p, pr_p, dec_p)

        self._encode = jax.jit(lambda p, x: self.encoder.apply(p, x))
        self._prompt = jax.jit(lambda p, b: self.prompt_encoder.apply(p, b))
        self._dense_pe = jax.jit(
            lambda p: self.prompt_encoder.apply(p, method=PromptEncoder.get_dense_pe)
        )
        self._decode = jax.jit(
            lambda p, emb, pe, sp: self.mask_decoder.apply(
                p, emb, pe, sp, multimask_output=False
            )
        )

    # --- persistence ---
    def save_params(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.params), f)

    def load_params(self, path: str):
        with open(path, "rb") as f:
            self.params = jax.tree.map(jnp.asarray, pickle.load(f))
        return self

    @classmethod
    def pretrained(cls, **kw) -> "SAM":
        """SAM with the shipped synthetic-data-trained weights when present
        (`models/weights/sam_synth.pkl`, produced by `models/sam_train.py`),
        random-init otherwise."""
        sam = cls(**kw)
        from sags_tpu.models.sam_train import load_pretrained

        load_pretrained(sam)
        return sam


def sam_model_registry_entry(name: str):
    def build(checkpoint: Optional[str] = None, **kw):
        sam = SAM(**kw)
        if checkpoint:
            sam.load_params(checkpoint)
        if name == "PromptGuidedDecoder":
            return {"PromtEncoder": sam.prompt_encoder, "MaskDecoder": sam.mask_decoder,
                    "sam": sam}
        return sam

    return build


# `sam_model_registry` — names from `scripts/gaussian_splatting.py:140-144`
sam_model_registry: Dict[str, Any] = {
    "PromptGuidedDecoder": sam_model_registry_entry("PromptGuidedDecoder"),
    "efficientvit_l2": sam_model_registry_entry("efficientvit_l2"),
    "vit_h": sam_model_registry_entry("vit_h"),
}


class SamPredictor:
    """`.set_image` / `.features` / `.transform` / `.postprocess_masks`."""

    def __init__(self, sam: SAM):
        self.model = sam
        self.transform = ResizeLongestSide(sam.img_size)
        self.features = None
        self.original_size = None
        self.input_size = None

    def set_image(self, image: np.ndarray):
        """image [H,W,3] in [0,255] or [0,1]."""
        image = np.asarray(image, np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        canvas = np.zeros((self.model.img_size, self.model.img_size, 3), np.float32)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        self.features = self.model._encode(
            self.model.params.encoder, jnp.asarray(canvas)[None]
        )
        return self

    def decode_boxes(self, boxes_canvas: np.ndarray) -> jax.Array:
        """Batched box-prompted low-res masks [N, 4G, 4G] (logits)."""
        sparse = self.model._prompt(
            self.model.params.prompt, jnp.asarray(boxes_canvas, jnp.float32)
        )
        pe = self.model._dense_pe(self.model.params.prompt)
        feats = jnp.tile(self.features, (sparse.shape[0], 1, 1, 1))
        masks = self.model._decode(self.model.params.decoder, feats, pe, sparse)
        return masks[:, 0]

    def postprocess_masks(self, low_res: jax.Array) -> np.ndarray:
        """Upscale canvas-space logits to the original image size."""
        S = self.model.img_size
        up = jax.image.resize(
            low_res, (low_res.shape[0], S, S), method="bilinear"
        )
        ih, iw = self.input_size
        # low_res covers the full canvas at 1/4 res; crop the valid region
        up = up[:, :ih, :iw]
        oh, ow = self.original_size
        return np.asarray(
            jax.image.resize(up, (low_res.shape[0], oh, ow), method="bilinear")
        )
