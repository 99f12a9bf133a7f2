"""Frozen VGG-16 feature extractor (conv1_1 .. conv4_3) in JAX.

Replaces the reference's freeze_vgg.py / vgg_16_frozen.pb machinery
(vgg.py:125-185, freeze_vgg.py:4-16, README.md:24-30): "frozen" here simply
means `jax.lax.stop_gradient` on the features and the VGG params living
outside the optimizer state. Only the conv1-conv4_3 prefix is built — the
reference imports exactly the 'vgg_16/conv4/conv4_3/Relu:0' endpoint
(direct_offset_output.py:421-422); other endpoints are exposed via
`feature_layer` for parity with main.py:55-56.

TPU notes:
  * NHWC layout, 3x3 SAME convs — XLA maps these straight onto the MXU and
    fuses the ReLUs; bfloat16 compute with float32 accumulate
    (preferred_element_type) is the fast path.
  * The 8x8 token gather (receptive_field_sizes.py:135-143) is a strided
    slice `[:, 6:21:2, 6:21:2, :]` — the conv43Points grid is exactly that,
    row-major — which XLA folds into the preceding conv's output layout.

Weight loading: TF is not a dependency. `load_params_npz` reads a .npz of
slim-named arrays ('vgg_16/conv1/conv1_1/weights', HWIO layout), which is
what a one-off offline conversion of the public vgg_16.ckpt produces;
`load_params_torch` maps a torchvision VGG16 state_dict (OIHW -> HWIO).
Random init otherwise.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels, followed_by_pool)
VGG16_PREFIX: List[Tuple[str, int, bool]] = [
    ("conv1/conv1_1", 64, False),
    ("conv1/conv1_2", 64, True),
    ("conv2/conv2_1", 128, False),
    ("conv2/conv2_2", 128, True),
    ("conv3/conv3_1", 256, False),
    ("conv3/conv3_2", 256, False),
    ("conv3/conv3_3", 256, True),
    ("conv4/conv4_1", 512, False),
    ("conv4/conv4_2", 512, False),
    ("conv4/conv4_3", 512, True),
    ("conv5/conv5_1", 512, False),
    ("conv5/conv5_2", 512, False),
    ("conv5/conv5_3", 512, True),
]

# (kernel, stride, pad, name) for the conv1_1..conv4_3 prefix, derived from
# VGG16_PREFIX — the geometry table receptive_field()/project_receptive_field()
# walk (receptive_field_sizes.py net definition through conv4_3)
def _net_def_through_conv43() -> List[Tuple[int, int, int, str]]:
    out: List[Tuple[int, int, int, str]] = []
    for name, _ch, pooled in VGG16_PREFIX[:10]:  # conv1_1 .. conv4_3
        short = name.split("/")[-1]
        out.append((3, 1, 1, short))  # every VGG conv is 3x3/s1/p1
        if pooled and short != "conv4_3":  # projectRF's table has no pool4
            out.append((2, 2, 0, "pool" + short[4]))
    return out


NET_DEF: List[Tuple[int, int, int, str]] = _net_def_through_conv43()

# VGG preprocessing mean, RGB (direct_offset_output.py:58-59)
VGG_MEAN = np.array([123.68, 116.78, 103.94], dtype=np.float32)

# The fixed 64-point subsample of the 28x28 conv4_3 map used as NTM tokens
# (receptive_field_sizes.py:135-143): 8x8 grid, stride 2, from (6,6) to (20,20).
CONV43_POINTS: List[Tuple[int, int]] = [
    (y, x) for y in range(6, 21, 2) for x in range(6, 21, 2)
]


def init_vgg_params(rng: jax.Array, dtype=jnp.float32) -> Dict[str, Dict[str, jax.Array]]:
    """He-normal random init (for tests / training-from-scratch)."""
    params: Dict[str, Dict[str, jax.Array]] = {}
    in_ch = 3
    for name, out_ch, _ in VGG16_PREFIX:
        rng, kr = jax.random.split(rng)
        fan_in = 3 * 3 * in_ch
        w = jax.random.normal(kr, (3, 3, in_ch, out_ch), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"weights": w, "biases": jnp.zeros((out_ch,), dtype)}
        in_ch = out_ch
    return params


def load_params_npz(path: str) -> Dict[str, Dict[str, jax.Array]]:
    """Load from a .npz with slim checkpoint names:
    'vgg_16/<block>/<layer>/weights' [3,3,in,out] and '/biases' [out]."""
    data = np.load(path)
    params = {}
    for name, out_ch, _ in VGG16_PREFIX:
        key = f"vgg_16/{name}/weights"
        if key not in data:
            # conv5 is only needed for the pool5 endpoint; tolerate
            # conv1-conv4_3-only archives
            if name.startswith("conv5"):
                continue
            raise KeyError(key)
        w = data[key]
        b = data[f"vgg_16/{name}/biases"]
        assert w.shape[-1] == out_ch, (name, w.shape)
        params[name] = {"weights": jnp.asarray(w, jnp.float32),
                        "biases": jnp.asarray(b, jnp.float32)}
    return params


def load_params_torch(state_dict) -> Dict[str, Dict[str, jax.Array]]:
    """Map a torchvision vgg16 state_dict (features.N.weight, OIHW) onto the
    slim-prefix layout. Useful when only torch weights are on disk."""
    # torchvision vgg16 'features' conv indices for the conv1..conv4_3 prefix
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for (name, out_ch, _), ti in zip(VGG16_PREFIX, torch_idx):
        if f"features.{ti}.weight" not in state_dict:
            if name.startswith("conv5"):
                continue  # pool5 endpoint unavailable, prefix still usable
            raise KeyError(f"features.{ti}.weight")
        w = np.asarray(state_dict[f"features.{ti}.weight"])  # [O,I,H,W]
        b = np.asarray(state_dict[f"features.{ti}.bias"])
        assert w.shape[0] == out_ch, (name, w.shape)
        params[name] = {
            "weights": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),  # HWIO
            "biases": jnp.asarray(b, jnp.float32),
        }
    return params


def _conv_relu(
    x: jax.Array, w: jax.Array, b: jax.Array, compute_dtype=None,
    padding: str = "SAME",
) -> jax.Array:
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y + b)


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _conv1_relu_s2d(
    x: jax.Array, w: jax.Array, b: jax.Array, compute_dtype=None
) -> jax.Array:
    """conv1_1 (3x3 VALID, stride 1, 3 input channels) reformulated as a
    2x2 conv on 2x2 space-to-depth input.

    A 3-channel convolution runs the MXU at ~5% utilization when timed in
    isolation (v5e, B=256: 3.96 ms for 36 GFLOP — the systolic array pads
    the reduction dim). Packing 2x2 input blocks into 12 channels and
    emitting all 4 output positions per block as 4*64 channels computes the
    SAME dot products (each output still sums the same 27 w*x terms,
    f32-accumulated, just grouped differently) at 1.78x the nominal FLOPs.

    MEASURED AND REJECTED as the default (kept for the record + the
    even-H/W path where it may win): inside the full fused conv stack at
    B=256 the whole-stack time went 31.9 -> 36.7 ms with this enabled —
    the space-to-depth/depth-to-space transposes cost more than the
    stand-alone conv1_1 inefficiency, i.e. XLA already hides most of the
    3-channel conv behind fusion. Requires even H,W; output matches the
    plain VALID conv to float-reassociation noise.
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    assert H % 2 == 0 and W % 2 == 0 and w.shape[:3] == (3, 3, C), (x.shape, w.shape)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # space-to-depth: packed channel index = (q, qx, c) -> q*2C + qx*C + c
    xp = (
        x.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )
    # scatter the 3x3 kernel into the packed 2x2 kernel: output position
    # (2i+dy, 2j+dx) reads input (2i+dy+ky, 2j+dx+kx) = packed cell
    # (i+p, j+pj) sub-position (q, qx) with (p,q) = divmod(dy+ky, 2)
    w2 = jnp.zeros((2, 2, 4 * C, 4 * O), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            for ky in range(3):
                for kx in range(3):
                    p, q = divmod(dy + ky, 2)
                    pj, qx = divmod(dx + kx, 2)
                    ci = q * 2 * C + qx * C
                    oi = (dy * 2 + dx) * O
                    w2 = w2.at[p, pj, ci : ci + C, oi : oi + O].set(w[ky, kx])
    y = jax.lax.conv_general_dilated(
        xp, w2,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # [B, H//2-1, W//2-1, 4*O]
    Ho, Wo = y.shape[1], y.shape[2]
    # depth-to-space: channel (dy, dx, o) -> position (2i+dy, 2j+dx)
    y = (
        y.reshape(B, Ho, Wo, 2, 2, O)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, 2 * Ho, 2 * Wo, O)
    )
    return jax.nn.relu(y + b)


def vgg16_features(
    params: Dict[str, Dict[str, jax.Array]],
    images: jax.Array,
    endpoint: str = "conv4/conv4_3",
    compute_dtype=None,
    freeze: bool = True,
) -> jax.Array:
    """Run the VGG prefix on mean-subtracted images [B,H,W,3] (NHWC).

    Returns the ReLU activation at `endpoint` ([B,28,28,512] for conv4_3 at
    224 input; endpoint="pool5" gives [B,7,7,512] — the grid the reference's
    sevenbyseven/whole-frame experiments consume via --feature_layer,
    main.py:55-56). With freeze=True the result is stop_gradient-ed — the
    reference's frozen-graph import makes VGG constants
    (direct_offset_output.py:417-422)."""
    want_pool5 = endpoint == "pool5"
    stop_at = "conv5/conv5_3" if want_pool5 else endpoint
    valid = {name for name, _, _ in VGG16_PREFIX} | {"pool5"}
    if endpoint not in valid:
        raise ValueError(
            f"unknown endpoint {endpoint!r}; use one of {sorted(valid)} "
            "(block-qualified, e.g. 'conv4/conv4_3')"
        )
    x = images
    for name, _, has_pool in VGG16_PREFIX:
        if name not in params:
            raise KeyError(
                f"VGG params missing {name!r} (needed for endpoint {endpoint!r})"
            )
        p = params[name]
        x = _conv_relu(x, p["weights"], p["biases"], compute_dtype)
        if name == stop_at:
            if want_pool5:
                x = _max_pool_2x2(x)
            break
        if has_pool:
            x = _max_pool_2x2(x)
    x = x.astype(jnp.float32)
    if freeze:
        x = jax.lax.stop_gradient(x)
    return x


def vgg16_conv43_tokens(
    params: Dict[str, Dict[str, jax.Array]],
    images: jax.Array,
    compute_dtype=None,
    freeze: bool = True,
    conv1_s2d: bool = False,
) -> jax.Array:
    """The 64 CONV43_POINTS tokens at ~76% of the conv FLOPs — exact.

    The serving/training hot path only consumes conv4_3 at the fixed 8x8
    stride-2 grid (rows/cols 6..20; receptive_field_sizes.py:135-143). That
    grid's receptive field propagated back through every 3x3 conv and 2x2
    pool stays INTERIOR all the way to the input:

        conv4_3 6..20 <- conv4_2 5..21 <- conv4_1 4..22 <- pool3 3..23
        <- conv3_3 6..47 <- conv3_2 5..48 <- conv3_1 4..49 <- pool2 3..50
        <- conv2_2 6..101 <- conv2_1 5..102 <- pool1 4..103
        <- conv1_2 8..207 <- conv1_1 7..208 <- input 6..209

    so SAME-conv zero padding never participates and every pool window
    stays on the original (even-aligned) grid. Slicing the input to the
    204x204 patch and running the whole stack VALID therefore yields
    BIT-IDENTICAL tokens to extract_features(vgg16_features(images)) at f32
    (asserted in tests/test_vgg.py) at 16.1 vs 27.9 GFLOP per crop (-42%):
    measured 5087 -> 7926 frames/s/chip on v5e with this optimization
    (BENCH_r02.json).

    Only valid for 224x224 inputs and the canonical grid; callers with
    custom feature_points use the general path.
    """
    if images.shape[1] != 224 or images.shape[2] != 224:
        raise ValueError(
            f"fast conv4_3 token path expects 224x224 crops, got {images.shape}"
        )
    x = images[:, 6:210, 6:210, :]
    for name, _, has_pool in VGG16_PREFIX:
        p = params[name]
        if name == "conv1/conv1_1" and conv1_s2d:
            # opt-in space-to-depth reformulation (same math; measured
            # SLOWER in the fused stack on v5e — see _conv1_relu_s2d)
            x = _conv1_relu_s2d(x, p["weights"], p["biases"], compute_dtype)
        else:
            x = _conv_relu(x, p["weights"], p["biases"], compute_dtype, padding="VALID")
        if name == "conv4/conv4_3":
            break
        if has_pool:
            x = _max_pool_2x2(x)
    # 15x15 == conv4_3 rows 6..20; stride-2 = the canonical 8x8 grid
    assert x.shape[1] == x.shape[2] == 15, x.shape
    x = x[:, ::2, ::2, :].astype(jnp.float32)
    if freeze:
        x = jax.lax.stop_gradient(x)
    B, h, w, C = x.shape
    return x.reshape(B, h * w, C)


def extract_features(feature_map: jax.Array, points: Sequence[Tuple[int, int]] = tuple(CONV43_POINTS)) -> jax.Array:
    """Gather the 64 grid points into tokens [B, 64, C]
    (extract_features, direct_offset_output.py:392-399).

    For the canonical conv43 grid this is a strided slice; arbitrary point
    lists fall back to a gather."""
    pts = list(points)
    H, W = feature_map.shape[1], feature_map.shape[2]
    max_y = max(p[0] for p in pts)
    max_x = max(p[1] for p in pts)
    if max_y >= H or max_x >= W:
        raise ValueError(
            f"feature grid point ({max_y},{max_x}) out of bounds for a "
            f"{H}x{W} feature map — endpoint and feature_points disagree "
            "(jnp gather would silently clamp)"
        )
    if pts == CONV43_POINTS:
        sub = feature_map[:, 6:21:2, 6:21:2, :]  # [B,8,8,C] row-major == point order
        B, h, w, C = sub.shape
        return sub.reshape(B, h * w, C)
    ys = jnp.array([p[0] for p in pts])
    xs = jnp.array([p[1] for p in pts])
    return feature_map[:, ys, xs, :]


def project_receptive_field(
    y: int, x: int, layer: str = "conv4_3", input_size: int = 224, clamp: bool = True
):
    """Input-space receptive-field box of feature pixel (y, x) at `layer`
    (projectRF, receptive_field_sizes.py:38-102): walk the layers backward,
    expanding [lo, hi] by each kernel/stride/pad.

    Returns ((ymin, xmin), (ymax, xmax)) inclusive pixel coords; clamped to
    the image like the reference's `rectify` (:132-133)."""
    net_def = NET_DEF
    idx = next(i for i, (_, _, _, n) in enumerate(net_def) if n == layer)
    y0 = y1 = y
    x0 = x1 = x
    for k, s, p, _name in reversed(net_def[: idx + 1]):
        y0 = y0 * s - p
        x0 = x0 * s - p
        y1 = y1 * s - p + (k - 1)
        x1 = x1 * s - p + (k - 1)
    if clamp:
        y0, x0 = max(y0, 0), max(x0, 0)
        y1, x1 = min(y1, input_size - 1), min(x1, input_size - 1)
    return ((y0, x0), (y1, x1))


def receptive_field(net_def=None, input_size: int = 224):
    """Receptive field / absolute stride / blob size per layer
    (receptive_field_sizes.py:20-30). Dev utility kept for parity."""
    if net_def is None:
        net_def = NET_DEF
    r, s = 1, 1
    rows = [(1, 1, input_size, "data")]
    size = input_size
    for k, rs, p, name in net_def:
        r = r + (k - 1) * s
        s = s * rs
        size = (size - k + 2 * p) // rs + 1
        rows.append((r, s, size, name))
    return rows
