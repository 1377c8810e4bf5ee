"""NumPy oracle: a direct semantic port of the reference forward pass.

This is the *test oracle*, not the product (SURVEY.md §7 step 2).  Every op
reproduces the reference's observable numerics, including its quirks:

  * conv epilogue ``act(sum * scale + bias)`` (conv-v0.c:27)
  * centered pool windows with clamped bounds, and avgpool dividing by the
    full ``fs*fs`` even when the window is clipped (ffcnn.c:337-372)
  * pool output dims ``floor(dim/stride)`` (ffcnn.c:156-157)
  * approximate YOLO confidence ``1/(1 + exp(-bs)*(1 + exp(-cs)))``
    (ffcnn.c:451 — NOT sigmoid(bs)*sigmoid(cs))
  * ``scale_x_y`` applied to box w/h, not x/y (ffcnn.c:459-460)
  * greedy NMS with IoU = inter / min(area) when min=1 (ffcnn.c:316)
  * top-left-anchored nearest letterbox with integer scale math
    (ffcnn.c:259-289)

Anchored to the living reference, not just the source text: the
differential harness (tools/c_differential.py) runs this oracle's
semantics against the compiled conv-v0 binary — the reference's own
correctness oracle — with line-for-line agreement on the full
real-weight corpus, the model zoo, and random fuzz graphs (per-layer
|activation| sums match to f32 print precision).  Where the oracle
disagrees with the DEFAULT conv-v6 build, the reference itself is wrong
(the dw5x5 row-oh-2 bug, models/README.md).

Layout convention here is (H, W, C); the reference uses planar (C, H, W) but
the semantics are layout-independent.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from ..darknet.ir import Activation, LayerType, NetIR
from ..darknet.weights import FoldedConvParams


def activate(x: np.ndarray, act: int) -> np.ndarray:
    # utils.h:15-23; unknown types fall through to linear.
    if act == Activation.RELU:
        return np.maximum(x, 0)
    if act == Activation.LEAKY:
        return np.where(x > 0, x, np.float32(0.1) * x)
    if act == Activation.SIGMOID:
        return 1.0 / (1.0 + np.exp(-x))
    if act == Activation.MISH:
        return (x * np.tanh(np.log1p(np.exp(x)))).astype(x.dtype)
    if act == Activation.SWISH:
        return (x / (1.0 + np.exp(-x))).astype(x.dtype)
    return x


def conv_forward(x: np.ndarray, p: FoldedConvParams, stride: int, pad: int,
                 groups: int, act: int) -> np.ndarray:
    """Grouped conv with fused scale/bias/activation epilogue (conv-v0.c)."""
    H, W, C = x.shape
    fs, _, icg, fn = p.weights.shape
    ocg = fn // groups
    oh = (H - fs + 2 * pad) // stride + 1
    ow = (W - fs + 2 * pad) // stride + 1
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0))).astype(np.float32)
    # (oh, ow, C, fs, fs) patch view
    win = np.lib.stride_tricks.sliding_window_view(xp, (fs, fs), axis=(0, 1))
    win = win[::stride, ::stride][:oh, :ow]
    out = np.empty((oh, ow, fn), np.float32)
    for g in range(groups):
        pg = win[:, :, g * icg:(g + 1) * icg]             # (oh,ow,icg,fs,fs)
        wg = p.weights[:, :, :, g * ocg:(g + 1) * ocg]    # (fs,fs,icg,ocg)
        out[:, :, g * ocg:(g + 1) * ocg] = np.einsum(
            "yxcij,ijcf->yxf", pg, wg, optimize=True)
    out = out * p.scale + p.bias
    return activate(out, act).astype(np.float32)


def pool_forward(x: np.ndarray, fs: int, stride: int, is_max: bool) -> np.ndarray:
    """Centered, clamped pooling windows (ffcnn.c:337-372)."""
    H, W, C = x.shape
    oh, ow = H // stride, W // stride
    off = (fs - 1) // 2
    out = np.empty((oh, ow, C), np.float32)
    for oy in range(oh):
        iy = oy * stride
        ymin, ymax = max(0, iy - off), min(H, iy - off + fs)
        for ox in range(ow):
            ix = ox * stride
            xmin, xmax = max(0, ix - off), min(W, ix - off + fs)
            w = x[ymin:ymax, xmin:xmax]
            if is_max:
                out[oy, ox] = w.max(axis=(0, 1))
            else:
                out[oy, ox] = w.sum(axis=(0, 1)) / np.float32(fs * fs)
    return out


def upsample_forward(x: np.ndarray, stride: int) -> np.ndarray:
    """Nearest-neighbor x stride (ffcnn.c:396-410): out[y,x] = in[y//s, x//s]."""
    return np.repeat(np.repeat(x, stride, axis=0), stride, axis=1)


def letterbox(bgr: np.ndarray, net_w: int, net_h: int,
              mean: Tuple[float, float, float],
              norm: Tuple[float, float, float]) -> Tuple[np.ndarray, int, int]:
    """Reference net_input (ffcnn.c:259-289): aspect-preserving nearest resize
    anchored top-left (integer math), zero pad right/bottom, BGR→RGB with
    per-channel (px - mean) * norm.  Returns (net_h, net_w, 3) float32 RGB
    plus the (s1, s2) inverse-mapping scale pair."""
    h, w = bgr.shape[:2]
    if w * net_h > h * net_w:
        sw = net_w
        sh = sw * h // w
        s1, s2 = w, sw
    else:
        sh = net_h
        sw = sh * w // h
        s1, s2 = h, sh
    ys = (np.arange(sh) * s1) // s2
    xs = (np.arange(sw) * s1) // s2
    patch = bgr[ys][:, xs].astype(np.float32)          # (sh, sw, 3) BGR
    rgb = patch[:, :, ::-1]                            # channel k: R,G,B
    mean = np.asarray(mean, np.float32)
    norm = np.asarray(norm, np.float32)
    out = np.zeros((net_h, net_w, 3), np.float32)
    out[:sh, :sw] = (rgb - mean) * norm
    return out, s1, s2


def yolo_decode(feat: np.ndarray, layer, net_w: int, net_h: int) -> List[Tuple]:
    """Reference layer_yolo_forward (ffcnn.c:438-474).  Returns boxes in scan
    order (rows, cols, anchors) as (class, score, x1, y1, x2, y2) tuples in
    net-input pixel coords."""
    h, w, _ = feat.shape
    nc = layer.class_num
    f = feat.reshape(h, w, 3, 4 + 1 + nc).astype(np.float32)
    boxes = []
    for i in range(h):
        for j in range(w):
            for k in range(3):
                v = f[i, j, k]
                bs = v[4]
                cindex = int(np.argmax(v[5:]))   # first-max, like the C scan
                cs = v[5 + cindex]
                conf = 1.0 / (1.0 + np.exp(np.float64(-bs)) * (1.0 + np.exp(np.float64(-cs))))
                if conf >= layer.ignore_thres:
                    tx, ty, tw, th = v[0], v[1], v[2], v[3]
                    sx = 1.0 / (1.0 + np.exp(np.float64(-tx)))
                    sy = 1.0 / (1.0 + np.exp(np.float64(-ty)))
                    cx = (j + sx) * net_w / w
                    cy = (i + sy) * net_h / h
                    bw = np.exp(np.float64(tw)) * layer.anchors[k][0] * layer.scale_x_y
                    bh = np.exp(np.float64(th)) * layer.anchors[k][1] * layer.scale_x_y
                    boxes.append((cindex, np.float32(conf),
                                  cx - bw * 0.5, cy - bh * 0.5,
                                  cx + bw * 0.5, cy + bh * 0.5))
    return boxes


def yolov8_decode(feat: np.ndarray, layer, net_w: int, net_h: int
                  ) -> List[Tuple]:
    """Anchor-free YOLOv8 DFL head decode (extension; no reference
    counterpart — implements the public formulation independently, the
    semantic oracle for ops.yolo.decode_head_v8).  ``feat``:
    (h, w, 4*reg_max + nc); returns (class, score, x1, y1, x2, y2) in
    net-input pixels, scan order (rows, cols)."""
    h, w, _ = feat.shape
    rm, nc, stride = layer.reg_max, layer.class_num, layer.stride
    out = []
    for i in range(h):
        for j in range(w):
            v = feat[i, j].astype(np.float64)
            cls = v[4 * rm:]
            cidx = int(np.argmax(cls))               # first-max
            conf = 1.0 / (1.0 + np.exp(-cls[cidx]))
            if conf < layer.ignore_thres:
                continue
            dist = []
            for side in range(4):
                logits = v[side * rm:(side + 1) * rm]
                e = np.exp(logits - logits.max())
                p = e / e.sum()
                dist.append(float(np.dot(p, np.arange(rm))))
            l_, t_, r_, b_ = dist
            cx, cy = j + 0.5, i + 0.5
            out.append((cidx, np.float32(conf),
                        (cx - l_) * stride, (cy - t_) * stride,
                        (cx + r_) * stride, (cy + b_) * stride))
    return out


def nms(boxes: List[Tuple], threshold: float, use_min: bool,
        s1: int, s2: int) -> List[Tuple]:
    """Reference greedy NMS (ffcnn.c:298-335): sort desc by score, per-class
    suppression with IoU-over-min(area), then rescale survivors to original
    image coords by s1/s2."""
    if not boxes:
        return []
    order = sorted(range(len(boxes)), key=lambda i: -boxes[i][1])
    arr = [list(boxes[i]) for i in order]
    n = len(arr)
    for c in range(n):
        if arr[c][1] == 0:
            continue
        for j in range(c + 1, n):
            if arr[j][1] == 0 or arr[j][0] != arr[c][0]:
                continue
            xc1 = max(arr[c][2], arr[j][2]); yc1 = max(arr[c][3], arr[j][3])
            xc2 = min(arr[c][4], arr[j][4]); yc2 = min(arr[c][5], arr[j][5])
            inter = (xc2 - xc1) * (yc2 - yc1) if (xc1 < xc2 and yc1 < yc2) else 0.0
            a1 = (arr[c][4] - arr[c][2]) * (arr[c][5] - arr[c][3])
            a2 = (arr[j][4] - arr[j][2]) * (arr[j][5] - arr[j][3])
            denom = min(a1, a2) if use_min else a1 + a2 - inter
            iou = inter / denom if denom else 0.0
            if iou > threshold:
                arr[j][1] = 0
    out = []
    for b in arr:
        if b[1]:
            out.append((b[0], b[1], b[2] * s1 / s2, b[3] * s1 / s2,
                        b[4] * s1 / s2, b[5] * s1 / s2))
    return out


def net_candidates(ir: NetIR, params: Dict[int, FoldedConvParams],
                   x: np.ndarray) -> List[Tuple]:
    """Forward pass → decoded above-threshold candidates BEFORE NMS, in the
    reference's (head, row, col, anchor) append order (ffcnn.c:461-469).
    Pre-NMS candidates are deterministic even when scores tie, which greedy
    NMS survivor identity is not — tests on deep synthetic nets use this."""
    n = len(ir.layers)
    blobs: List = [None] * (n + 1)
    blobs[0] = x.astype(np.float32)
    boxes: List[Tuple] = []
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    for li, layer in enumerate(ir.layers):
        inp = blobs[li]
        t = layer.type
        if t == LayerType.CONV:
            out = conv_forward(inp, params[li], layer.stride, layer.pad,
                               layer.groups, layer.activation)
        elif t in (LayerType.AVGPOOL, LayerType.MAXPOOL):
            out = pool_forward(inp, layer.fs, layer.stride,
                               t == LayerType.MAXPOOL)
        elif t == LayerType.UPSAMPLE:
            out = upsample_forward(inp, layer.stride)
        elif t == LayerType.DROPOUT:
            out = inp
        elif t == LayerType.SHORTCUT:
            out = activate(inp + blobs[layer.depends[0] + 1],
                           layer.activation).astype(np.float32)
        elif t == LayerType.ROUTE:
            parts = [blobs[d + 1] for d in layer.depends]
            out = np.concatenate(parts, axis=2)
            if layer.route_groups > 1:
                gc = out.shape[2] // layer.route_groups
                out = out[:, :, layer.route_group_id * gc:
                          (layer.route_group_id + 1) * gc]
        elif t == LayerType.YOLO:
            boxes.extend(yolo_decode(inp, layer, net_w, net_h))
            out = None
        elif t == LayerType.YOLOV8:
            boxes.extend(yolov8_decode(inp, layer, net_w, net_h))
            out = None
        else:
            raise ValueError(f"unknown layer type {t}")
        blobs[li + 1] = out
    if not any(l.type == LayerType.YOLO for l in ir.layers):
        return boxes                    # pure-v8 graph: no arena quirk
    # bbox arena capacity: the reference's box list aliases the input blob
    # (ffcnn.c:242-244), so appends stop silently at input_bytes/sizeof(BBOX)
    # candidates (ffcnn.c:461) — first-come in this exact append order.
    cap = (net_w * net_h * ir.blobs[0].c * 4) // 24
    return boxes[:cap]


def net_forward(ir: NetIR, params: Dict[int, FoldedConvParams],
                x: np.ndarray, s1: int = 1, s2: int = 1,
                nms_threshold: float = None) -> List[Tuple]:
    """Full oracle forward: preprocessed net input (H, W, C) → final box list
    (class, score, x1, y1, x2, y2) in original-image coords.  Mirrors
    net_forward's sequential dispatch (ffcnn.c:476-520).  Pure-v8 graphs
    use the standard union-IoU NMS at 0.7 (the public default the product
    pipeline mirrors, ops/nms.py V8_NMS_THRESHOLD); reference graphs keep the
    min-IoU 0.5 quirk (ffcnn.c:316,519)."""
    v8_only = (ir.layers and not any(l.type == LayerType.YOLO
                                     for l in ir.layers)
               and any(l.type == LayerType.YOLOV8 for l in ir.layers))
    if nms_threshold is None:
        nms_threshold = 0.7 if v8_only else 0.5
    return nms(net_candidates(ir, params, x), nms_threshold,
               not v8_only, s1, s2)


def detect(ir: NetIR, params: Dict[int, FoldedConvParams], bgr: np.ndarray,
           mean=(0.0, 0.0, 0.0), norm=(1 / 255.0,) * 3) -> List[Tuple]:
    """Oracle pixels-to-boxes: letterbox + forward + NMS (the demo main's
    net_input/net_forward sequence, ffcnn.c:577-580)."""
    x, s1, s2 = letterbox(bgr, ir.blobs[0].w, ir.blobs[0].h, mean, norm)
    return net_forward(ir, params, x, s1, s2)
