"""Instance-mask generation pipeline — `generate_objects` equivalent.

Mirrors `scripts/gaussian_splatting.py:493-580`: box proposals → SAM decoder
in batches of 32 → threshold at `mask_threshold` → masks sorted by area
(descending) → unique random labels in [1, num_classes) painted
largest-first into a grayscale label map (`generate_grayscale_mask_torch`).
"""

from __future__ import annotations

import random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.models.box_proposer import BoxProposer, SegmentationBoxProposer
from sags_tpu.models.sam import SAM, SamPredictor


class MaskGenerator:
    """Box-prompted instance label maps."""

    def __init__(
        self,
        box_proposer: Optional[BoxProposer] = None,
        sam: Optional[SAM] = None,
        num_classes: int = 100,
        imgsz: int = 256,
        batch_size: int = 32,
        seed: int = 0,
    ):
        self.box_proposer = box_proposer or SegmentationBoxProposer()
        self.sam = sam or SAM.pretrained()
        self.predictor = SamPredictor(self.sam)
        self.num_classes = num_classes
        self.imgsz = imgsz
        self.batch_size = batch_size
        self.used_labels: set = set()
        self._random = random.Random(seed)

    def batch_iterator(self, batch_size: int, *args):
        n = len(args[0])
        n_batches = n // batch_size + int(n % batch_size != 0)
        for b in range(n_batches):
            yield [a[b * batch_size : (b + 1) * batch_size] for a in args]

    def generate_masks(self, image: np.ndarray) -> np.ndarray:
        """image [3,H,W] or [H,W,3] float → boolean masks [N,H,W]."""
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = img.transpose(1, 2, 0)
        results = self.box_proposer(
            img, device=None, retina_masks=True, imgsz=self.imgsz, conf=0.4, iou=0.9
        )
        if not results:
            return np.zeros((0,) + img.shape[:2], bool)
        boxes = np.asarray(results[0].boxes.xyxy)
        self.predictor.set_image(img)
        boxes_c = self.predictor.transform.apply_boxes(
            boxes, self.predictor.original_size
        )
        masks = []
        for (b,) in self.batch_iterator(self.batch_size, boxes_c):
            low_res = self.predictor.decode_boxes(b)
            up = self.predictor.postprocess_masks(low_res)
            masks.append(up > self.sam.mask_threshold)
        return np.concatenate(masks, axis=0)

    def generate_grayscale_mask(self, masks: np.ndarray) -> np.ndarray:
        """[N,H,W] bool → [H,W] int labels, largest-area-first, unique random
        labels (`generate_grayscale_mask_torch`)."""
        if len(masks) == 0:
            return None
        H, W = masks.shape[1:]
        out = np.zeros((H, W), np.int64)
        areas = masks.sum(axis=(1, 2))
        order = np.argsort(-areas)
        self.used_labels = set()
        for idx in order[: min(len(masks), self.num_classes)]:
            label = self._random.randint(1, self.num_classes - 1)
            while label in self.used_labels and len(self.used_labels) < self.num_classes - 1:
                label = self._random.randint(1, self.num_classes - 1)
            self.used_labels.add(label)
            out[masks[idx]] = label
        return out

    def generate_objects(self, image: np.ndarray) -> np.ndarray:
        """Full pipeline → [H,W] int label map (0 = background)."""
        img = np.asarray(image)
        hw = img.shape[1:] if img.shape[0] in (1, 3) else img.shape[:2]
        masks = self.generate_masks(image)
        if len(masks) == 0:
            return np.zeros(hw, np.int64)
        gm = self.generate_grayscale_mask(masks)
        return gm if gm is not None else np.zeros(hw, np.int64)
