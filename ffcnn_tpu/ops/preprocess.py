"""On-device letterbox preprocess.

Replicates ``net_input`` (ffcnn.c:259-289) — aspect-preserving nearest resize
anchored top-left with pure integer source-index math, zero pad right/bottom,
BGR→RGB, per-channel ``(px - mean) * norm`` — but runs as part of the jitted
device program: raw uint8 frames are the only host→device transfer, and the
gather/normalize fuses with the first conv.

The scale pair (s1, s2) is computed at trace time from static shapes and is
also what maps detections back to original-image pixels (ffcnn.c:327-330).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def letterbox_params(img_w: int, img_h: int, net_w: int, net_h: int
                     ) -> Tuple[int, int, int, int]:
    """(sw, sh, s1, s2) per ffcnn.c:267-273 (integer math)."""
    if img_w * net_h > img_h * net_w:
        sw = net_w
        sh = sw * img_h // img_w
        s1, s2 = img_w, sw
    else:
        sh = net_h
        sw = sh * img_w // img_h
        s1, s2 = img_h, sh
    return sw, sh, s1, s2


def _resize_pad(bgr, net_w: int, net_h: int):
    """Nearest resize (top-left anchored) + zero pad right/bottom, in the
    input dtype.  Identity when the image already has the net dims, so the
    common serving case compiles to a no-op."""
    n, h, w, _ = bgr.shape
    sw, sh, s1, s2 = letterbox_params(w, h, net_w, net_h)
    if (sw, sh) != (w, h):
        ys = (np.arange(sh) * s1) // s2      # ffcnn.c:280 integer division
        xs = (np.arange(sw) * s1) // s2
        bgr = bgr[:, ys][:, :, xs]                     # (N, sh, sw, 3) BGR
    if (sw, sh) != (net_w, net_h):
        bgr = jnp.pad(bgr, ((0, 0), (0, net_h - sh), (0, net_w - sw), (0, 0)))
    return bgr


def letterbox_uint8(bgr, net_w: int, net_h: int):
    """Fast-path preprocess: uint8 resize+pad ONLY.  BGR→RGB, normalize, and
    the float cast are folded into the first conv's weights
    (graph/build.py:fold_input_transform), so the net input stays uint8 and
    the cast fuses into the conv-1 XLA fusion."""
    return _resize_pad(bgr, net_w, net_h)


def letterbox(bgr, net_w: int, net_h: int, mean=(0.0, 0.0, 0.0),
              norm=(1 / 255.0, 1 / 255.0, 1 / 255.0), dtype=jnp.float32):
    """uint8 (N, H, W, 3) BGR → (N, net_h, net_w, 3) float RGB net input.

    Shapes are static so the gather indices fold into constants."""
    n, h, w, _ = bgr.shape
    sw, sh, s1, s2 = letterbox_params(w, h, net_w, net_h)
    patch = _resize_pad(bgr, net_w, net_h)
    rgb = patch[..., ::-1].astype(dtype)
    mean_a = jnp.asarray(mean, dtype)
    norm_a = jnp.asarray(norm, dtype)
    val = (rgb - mean_a) * norm_a
    if (sw, sh) == (net_w, net_h):
        return val
    # zero the padded border exactly (pad ran on raw uint8, pre-normalize)
    mask = np.zeros((net_h, net_w, 1), bool)
    mask[:sh, :sw] = True
    return jnp.where(jnp.asarray(mask), val, jnp.zeros((), dtype))
