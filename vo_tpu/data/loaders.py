"""Dataset loaders: KITTI odometry, Malaga urban, "parking".

Capability parity with the reference's Sequence loader
(src/vo/primitives/loader.py:11-260): same three datasets, same calibration
parsing behavior (KITTI calib.txt P-line, loader.py:85-93; Malaga
camera-params configparser with raw/rectified/lowres variants,
loader.py:114-158; parking K.txt, loader.py:172-182), same lazy per-frame
decode + iterator protocol (loader.py:184-237). Differences by design:

  * ground-truth pose loading is first-class (the reference ships KITTI
    poses in tests/test_data but never reads them — SURVEY §5);
  * frames are returned as f32 grayscale numpy arrays ready for device
    transfer (decode stays on host; the jitted step owns everything after);
  * no cv2 GUI types anywhere.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field
from glob import glob

import numpy as np

from vo_tpu.data import native_loader


def _imread_gray_pil(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


def _imread_gray(path: str) -> np.ndarray:
    """Decode via the native C++ loader (native/frame_loader.cc) when built,
    PIL otherwise. Both produce identical f32 grayscale (ITU-R 601-2)."""
    if native_loader.available():
        return native_loader.decode_gray(path)
    return _imread_gray_pil(path)


@dataclass
class Sequence:
    """Iterable frame source with intrinsics and optional ground truth.

    Args mirror the reference loader (loader.py:23-31): dataset in
    {"kitti", "malaga", "parking"}, a data root, camera index, frame
    increment, and the Malaga rectified/lowres variants.
    """

    dataset: str
    path: str = "./data"
    camera: int = 0
    increment: int = 1
    rectified: bool = True
    use_lowres: bool = False
    kitti_sequence: str = "05"

    frames: list = field(default_factory=list, init=False)
    K: np.ndarray = field(default=None, init=False)
    gt_poses: np.ndarray | None = field(default=None, init=False)
    _idx: int = field(default=0, init=False)

    def __post_init__(self):
        loaders = {
            "kitti": self._load_kitti,
            "malaga": self._load_malaga,
            "parking": self._load_parking,
        }
        if self.dataset not in loaders:  # loader.py:68-70
            raise ValueError(f"unknown dataset '{self.dataset}'")
        loaders[self.dataset]()
        if not self.frames:
            raise FileNotFoundError(
                f"no frames found for dataset '{self.dataset}' under {self.path}"
            )

    # -- per-dataset parsing ------------------------------------------------

    def _load_kitti(self):
        """KITTI odometry layout: <root>/kitti/<seq>/image_{0,1}/*.png with
        calib.txt P0..P3 lines (parse parity: loader.py:85-93)."""
        base = os.path.join(self.path, "kitti", self.kitti_sequence)
        calib = os.path.join(base, "calib.txt")
        with open(calib) as f:
            for line in f:
                if line.startswith(f"P{self.camera}:"):
                    vals = np.fromstring(line.split(":", 1)[1], sep=" ")
                    P = vals.reshape(3, 4)
                    self.K = P[:, :3].astype(np.float32)
                    break
        if self.K is None:
            raise ValueError(f"no P{self.camera} line in {calib}")
        self.frames = sorted(
            glob(os.path.join(base, f"image_{self.camera}", "*.png"))
        )[:: self.increment]
        poses_file = os.path.join(self.path, "kitti", "poses", f"{self.kitti_sequence}.txt")
        if os.path.exists(poses_file):
            raw = np.loadtxt(poses_file).reshape(-1, 3, 4)
            n = len(raw)
            gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
            gt[:, :3, :4] = raw  # w_T_c rows (KITTI convention)
            self.gt_poses = gt[:: self.increment].astype(np.float32)

    def _load_malaga(self):
        """Malaga urban extract: camera_params ini + Images/*_left.jpg
        (parse parity: loader.py:114-158)."""
        base = os.path.join(self.path, "malaga")
        root = None
        for d in sorted(glob(os.path.join(base, "*"))):
            if os.path.isdir(d):
                root = d
                break
        root = root or base
        variant = "rectified" if self.rectified else "raw"
        res = "800x600" if not self.use_lowres else "640x480"
        ini_candidates = glob(os.path.join(root, "camera_params*.txt")) + glob(
            os.path.join(root, "*camera_params*")
        )
        K = None
        for ini in ini_candidates:
            cp = configparser.ConfigParser()
            try:
                cp.read(ini)
            except configparser.Error:
                continue
            for section in cp.sections():
                sec = cp[section]
                if all(k in sec for k in ("cx", "cy", "fx", "fy")):
                    K = np.array(
                        [
                            [float(sec["fx"]), 0.0, float(sec["cx"])],
                            [0.0, float(sec["fy"]), float(sec["cy"])],
                            [0.0, 0.0, 1.0],
                        ],
                        np.float32,
                    )
                    break
            if K is not None:
                break
        self.K = K
        img_dirs = [
            os.path.join(root, f"malaga-urban-dataset-extract-07_rectified_{res}_Images"),
            os.path.join(root, "Images"),
        ]
        for d in img_dirs:
            files = sorted(glob(os.path.join(d, "*_left.jpg")))
            if files:
                self.frames = files[:: self.increment]
                break
        del variant

    def _load_parking(self):
        """parking dataset: K.txt (comma/space separated 3x3) + images/*.png
        (parse parity: loader.py:172-182)."""
        base = os.path.join(self.path, "parking")
        ktxt = os.path.join(base, "K.txt")
        with open(ktxt) as f:
            txt = f.read().replace(",", " ")
        self.K = np.fromstring(txt, sep=" ").reshape(3, 3).astype(np.float32)
        self.frames = sorted(glob(os.path.join(base, "images", "*.png")))[:: self.increment]
        poses_file = os.path.join(base, "poses.txt")
        if os.path.exists(poses_file):
            raw = np.loadtxt(poses_file).reshape(-1, 3, 4)
            gt = np.tile(np.eye(4, dtype=np.float64), (len(raw), 1, 1))
            gt[:, :3, :4] = raw
            self.gt_poses = gt[:: self.increment].astype(np.float32)

    # -- frame access (loader.py:184-237) -----------------------------------

    def get_frame(self, idx: int) -> np.ndarray:
        return _imread_gray(self.frames[idx])

    def prefetch(self, n_threads: int = 4, ring: int = 8, start: int = 0):
        """Decode-ahead frame source backed by the native C++ thread pool.

        Returns a FramePrefetcher over frames[start:] — `get(i)` yields frame
        `start + i` (strictly sequential). Falls back to a lazy synchronous
        shim with the same `.get` interface when the library is absent."""
        paths = list(self.frames[start:])
        if native_loader.available():
            return native_loader.FramePrefetcher(
                paths, n_threads=n_threads, ring=ring
            )

        class _Lazy:
            n = len(paths)

            def get(self, i):
                return _imread_gray(paths[i])

            def __iter__(self):
                return (self.get(i) for i in range(self.n))

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return None

            def close(self):
                return None

        return _Lazy()

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self):
        self._idx = 0
        return self

    def __next__(self) -> np.ndarray:
        if self._idx >= len(self.frames):
            raise StopIteration
        img = self.get_frame(self._idx)
        self._idx += 1
        return img
