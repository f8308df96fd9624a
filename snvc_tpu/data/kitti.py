"""KITTI on-disk dataset access (host side).

Replaces the reference's kitti_dataset / kitti_object pair
(snvc/dataset/kitti_dataset.py:10-47, kitti_object.py:22-139) with one
index-addressed accessor over the standard KITTI object layout:

    root/
      training/ image_2/ image_3/ calib/ label_2/ velodyne/
      testing/  image_2/ image_3/ calib/ velodyne/
      train.txt val.txt trainval.txt test.txt
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from snvc_tpu.geometry.calib import Calibration, KittiLabel, read_label


def read_split(path: str) -> List[int]:
    with open(path, "r") as f:
        return [int(x) for x in (ln.strip() for ln in f) if x]


@dataclass
class KittiScene:
    """Paths + lazy accessors for one frame."""

    index: int
    image_dir: str
    right_image_dir: str
    calib_dir: str
    lidar_dir: str
    label_dir: Optional[str]

    @property
    def name(self) -> str:
        return f"{self.index:06d}"

    @property
    def left_image_path(self) -> str:
        return os.path.join(self.image_dir, self.name + ".png")

    @property
    def right_image_path(self) -> str:
        return os.path.join(self.right_image_dir, self.name + ".png")

    @property
    def lidar_path(self) -> str:
        return os.path.join(self.lidar_dir, self.name + ".bin")

    @property
    def calib_path(self) -> str:
        return os.path.join(self.calib_dir, self.name + ".txt")

    def calibration(self, camera: str = "left") -> Calibration:
        return Calibration.from_file(self.calib_path, camera)

    def labels(self) -> List[KittiLabel]:
        assert self.label_dir is not None, "split has no labels"
        return read_label(os.path.join(self.label_dir, self.name + ".txt"))

    def lidar(self) -> np.ndarray:
        """[N, 4] velodyne points (x, y, z, reflectance)."""
        return np.fromfile(self.lidar_path, dtype=np.float32).reshape(-1, 4)

    def native_image_size(self) -> Tuple[int, int]:
        """(H, W) of the stored left image, read from the PNG IHDR header
        (no decode).  KITTI frames are ~375x1242 — smaller than the padded
        batch canvas — and FOV checks must gate on the real extent or
        boxes whose center lands in the padding band pass the gate yet see
        only black pixels in the crop."""
        if not hasattr(self, "_native_hw"):
            with open(self.left_image_path, "rb") as f:
                head = f.read(26)
            if head[:8] != b"\x89PNG\r\n\x1a\n":  # non-PNG: decode fallback
                img = self.load_image("left")
                self._native_hw = (img.shape[0], img.shape[1])
            else:
                w = int.from_bytes(head[16:20], "big")
                h = int.from_bytes(head[20:24], "big")
                self._native_hw = (h, w)
        return self._native_hw

    def load_image(self, camera: str = "left") -> np.ndarray:
        """RGB uint8 [H, W, 3]."""
        import cv2

        path = self.left_image_path if camera == "left" else self.right_image_path
        img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def load_image_padded(self, camera: str, out_hw) -> np.ndarray:
        """RGB uint8 [out_h, out_w, 3], zero padded/cropped.

        Uses the native C++ decoder (cpp/dataloader.cpp) when available —
        it decodes straight into the padded buffer with no Python copies.
        """
        from snvc_tpu.data import native_loader

        path = self.left_image_path if camera == "left" else self.right_image_path
        if os.environ.get("SNVC_NATIVE_LOADER", "1") != "0":
            img = native_loader.decode_png_padded(path, out_hw)
            if img is not None:
                return img
        src = self.load_image(camera)
        out = np.zeros((out_hw[0], out_hw[1], 3), np.uint8)
        h = min(src.shape[0], out_hw[0])
        w = min(src.shape[1], out_hw[1])
        out[:h, :w] = src[:h, :w]
        return out

    def load_image_scaled(self, camera: str, out_hw):
        """RGB uint8 [out_h, out_w, 3] with an aspect-preserving downscale
        when the native image exceeds the target, then zero padding.

        Returns (image, s) where s is the uniform scale factor; the
        matching projection is diag(s, s, 1) @ P (pinhole model under
        uniform image scaling), so reduced-resolution training keeps
        geometry consistent instead of cropping most of the frame away.
        """
        import cv2

        src = self.load_image(camera)
        h, w = src.shape[:2]
        s = min(out_hw[0] / h, out_hw[1] / w)
        if s < 1.0:
            src = cv2.resize(
                src,
                (int(round(w * s)), int(round(h * s))),
                interpolation=cv2.INTER_AREA,
            )
        else:
            s = 1.0
        out = np.zeros((out_hw[0], out_hw[1], 3), np.uint8)
        hh = min(src.shape[0], out_hw[0])
        ww = min(src.shape[1], out_hw[1])
        out[:hh, :ww] = src[:hh, :ww]
        return out, s


class KittiDataset:
    """Split-aware KITTI object dataset (reference kitti_dataset.py:10-47)."""

    def __init__(self, root: str, split: str = "train"):
        self.root = root
        self.split = split
        folder = "testing" if split == "test" else "training"
        base = os.path.join(root, folder)
        self.image_dir = os.path.join(base, "image_2")
        self.right_image_dir = os.path.join(base, "image_3")
        self.calib_dir = os.path.join(base, "calib")
        self.lidar_dir = os.path.join(base, "velodyne")
        self.label_dir = (
            os.path.join(base, "label_2") if split != "test" else None
        )
        split_file = os.path.join(root, split + ".txt")
        if os.path.exists(split_file):
            self.indices = read_split(split_file)
        else:
            names = sorted(os.listdir(self.image_dir)) if os.path.isdir(self.image_dir) else []
            self.indices = [int(n.split(".")[0]) for n in names if n.endswith(".png")]

    def __len__(self) -> int:
        return len(self.indices)

    def scene(self, index: int) -> KittiScene:
        return KittiScene(
            index=index,
            image_dir=self.image_dir,
            right_image_dir=self.right_image_dir,
            calib_dir=self.calib_dir,
            lidar_dir=self.lidar_dir,
            label_dir=self.label_dir,
        )

    def scenes(self) -> List[KittiScene]:
        return [self.scene(i) for i in self.indices]
