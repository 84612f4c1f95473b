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
    PIL otherwise. Both produce identical f32 grayscale (ITU-R 601-2) for
    8-bit inputs; formats the native path declines (e.g. 16-bit PNG, where
    the two libraries' narrowing conventions differ) fall back to PIL."""
    if native_loader.available():
        try:
            return native_loader.decode_gray(path)
        except IOError:
            pass
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
            "synthetic": self._load_synthetic,
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
        """Malaga urban extract (parse parity: loader.py:100-158): images at
        <root>/malaga-urban-dataset-extract-07/Images/*{left,right}.jpg; the
        intrinsics ini is picked by variant —

          raw:                camera_params_raw_1024x768.txt,
                              section CAMERA_PARAMS_{LEFT,RIGHT}
          rectified (lowres): camera_params_rectified_a=0_800x600.txt
          rectified:          camera_params_rectified_a=0_1024x768.txt,
                              section CAMERA_{LEFT,RIGHT}

        and values may carry trailing `// comments` (ref splits on "//").
        Raises if the intrinsics file or required keys are missing — the
        reference would KeyError; a silent K=None crashes far from the cause.
        """
        base = os.path.join(self.path, "malaga")
        root = os.path.join(base, "malaga-urban-dataset-extract-07")
        if not os.path.isdir(root):
            # Tolerate the extract dir sitting directly under the data root.
            alt = os.path.join(self.path, "malaga-urban-dataset-extract-07")
            root = alt if os.path.isdir(alt) else root

        side = "left" if self.camera == 0 else "right"
        if not self.rectified:
            ini_name = "camera_params_raw_1024x768.txt"
            section = f"CAMERA_PARAMS_{side.upper()}"
        else:
            res = "800x600" if self.use_lowres else "1024x768"
            ini_name = f"camera_params_rectified_a=0_{res}.txt"
            section = f"CAMERA_{side.upper()}"
        ini = os.path.join(root, ini_name)
        if not os.path.exists(ini):
            raise FileNotFoundError(f"malaga intrinsics file not found: {ini}")
        cp = configparser.ConfigParser()
        cp.read(ini)
        if section not in cp:
            raise KeyError(f"section [{section}] not in {ini}")
        sec = cp[section]

        def val(key: str) -> float:
            # Malaga ini values carry `// comment` suffixes (ref loader.py:144).
            return float(sec[key].split("//")[0])

        self.K = np.array(
            [
                [val("fx"), 0.0, val("cx")],
                [0.0, val("fy"), val("cy")],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        self.frames = sorted(
            glob(os.path.join(root, "Images", f"*{side}.jpg"))
        )[:: self.increment]

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

    def _load_synthetic(self):
        """Procedurally generated city sequence (vo_tpu.data.synthetic) —
        rendered once into <root>/synthetic in the parking layout, then
        parsed exactly like parking. The zero-egress stand-in for the
        reference's full-length downloaded sequences (setup.sh:4-6)."""
        from vo_tpu.data import synthetic

        base = synthetic.ensure_synthetic(self.path)
        ktxt = os.path.join(base, "K.txt")
        with open(ktxt) as f:
            txt = f.read().replace(",", " ")
        self.K = np.fromstring(txt, sep=" ").reshape(3, 3).astype(np.float32)
        self.frames = sorted(glob(os.path.join(base, "images", "*.png")))[:: self.increment]
        raw = np.loadtxt(os.path.join(base, "poses.txt")).reshape(-1, 3, 4)
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
