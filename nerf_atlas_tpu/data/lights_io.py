"""EXR image reading (for NeRV data), gated on available backends."""
from __future__ import annotations

import numpy as np


def read_exr(path: str) -> np.ndarray:
  """Read an EXR as float32 HWC. Tries imageio then OpenCV."""
  try:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32)
  except Exception:
    pass
  import cv2
  img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
  if img is None:
    raise IOError(f"cannot read EXR {path}")
  if img.ndim == 3:
    img = img[..., ::-1]  # BGR -> RGB
  return np.asarray(img, np.float32)
