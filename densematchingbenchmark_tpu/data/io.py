"""Image / disparity file IO.

Parity targets:
  dmb/data/datasets/utils/load_disp.py:5-68 (PFM reader, SceneFlow)
  dmb/data/datasets/stereo/kitti/base.py:34-48 (uint16 PNG / 256)
  dmb/visualization/stereo/save_result.py:12-37 (KITTI submission PNG x256)

Fresh implementations of the standard formats (PFM spec: header 'PF'/'Pf',
'<width> <height>', scale with sign = endianness, rows bottom-up).
"""

import re

import numpy as np

# Prefer the native C++ decoders (densematchingbenchmark_tpu/native) when
# the shared library is available; fall back to pure Python otherwise.
try:
    from .. import native as _native
    _NATIVE = _native.available()
except Exception:
    _native, _NATIVE = None, False


def load_pfm(path):
    """Read a PFM file -> (float32 array [H, W] or [H, W, 3], scale)."""
    if _NATIVE:
        return _native.decode_pfm(path), 1.0
    with open(path, "rb") as fp:
        header = fp.readline().decode("latin-1").rstrip()
        if header == "PF":
            channels = 3
        elif header == "Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        dims = fp.readline().decode("latin-1")
        m = re.match(r"^\s*(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM dimensions {dims!r}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(fp.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(fp, dtype=endian + "f4",
                           count=width * height * channels)
    shape = (height, width, 3) if channels == 3 else (height, width)
    # PFM stores rows bottom-to-top
    return np.flipud(data.reshape(shape)).astype(np.float32), abs(scale)


def save_pfm(path, data, scale=1.0):
    """Write a float32 [H, W] or [H, W, 3] array as little-endian PFM."""
    data = np.asarray(data, np.float32)
    color = data.ndim == 3
    with open(path, "wb") as fp:
        fp.write(b"PF\n" if color else b"Pf\n")
        fp.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        fp.write(f"{-abs(scale)}\n".encode())  # negative = little-endian
        np.flipud(data).astype("<f4").tofile(fp)


def load_image(path):
    """RGB image -> float32 [H, W, 3] (drops alpha)."""
    if _NATIVE and path.endswith(".png"):
        return _native.decode_png_rgb(path)
    from imageio.v2 import imread
    img = np.asarray(imread(path), np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


def load_kitti_disp(path):
    """KITTI disparity PNG (uint16, value/256; 0 = invalid) -> [H, W] f32."""
    if _NATIVE:
        return _native.decode_png_disp16(path)
    from imageio.v2 import imread
    return np.asarray(imread(path), np.float32) / 256.0


def save_kitti_disp(path, disp):
    """KITTI submission format: uint16 PNG of disp * 256."""
    from imageio.v2 import imwrite
    disp = np.asarray(disp, np.float32)
    imwrite(path, np.clip(disp * 256.0, 0, 65535).astype(np.uint16))


def load_disp(path):
    """Dispatch on extension: .pfm (SceneFlow) or .png (KITTI)."""
    if path.endswith(".pfm"):
        return load_pfm(path)[0]
    return load_kitti_disp(path)
