"""Int8 quantized convolution for the inference serving path.

TPU v5e's MXU runs int8 matmuls/convs at 2x the bf16 rate (394 vs 197
TOPS). The flagship step is conv-dominated and its bf16 convs already run at
~100% of bf16 peak (PERFORMANCE.md "Where the time goes"), so int8 is the
only remaining step-time lever: `scripts/bench_int8.py` measured 1.19x
(dynamic activation scales) / 1.26x (static) net of quantization overhead on
the dominant conv shape.

Scheme (weight-only state, no calibration assets):
  * weights: symmetric per-output-channel int8 — max|w| over (kh, kw, cin)
    per output channel / 127.
  * activations: symmetric per-tensor int8 with a *dynamic* scale
    (max|x| / 127 computed on device per call). No calibration pass, no
    extra checkpoint state; the cost is one reduction + one elementwise
    pass, both HBM-bandwidth-cheap next to the conv itself.
  * accumulation in int32 (`preferred_element_type`), dequantized by
    ascale * wscale[cout].

The reference has no quantized path (torch fp32 end to end); this is a
TPU-native serving addition, inference-only (`--quantize int8`).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import Array, lax

Padding = Union[str, int, Sequence[Tuple[int, int]]]


def _pad_pairs(padding: Padding, ndims: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * ndims
    return [tuple(p) for p in padding]


def quantize_weights(kernel: Array) -> Tuple[Array, Array]:
    """HWIO float kernel -> (int8 kernel, f32 per-output-channel scale)."""
    k = kernel.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))  # (O,)
    wscale = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(k / wscale), -127, 127).astype(jnp.int8)
    return wq, wscale


def int8_conv(
    x: Array,
    kernel: Array,
    strides: Sequence[int],
    padding: Padding,
    out_dtype=None,
    static_amax: Array | None = None,
) -> Array:
    """NHWC x HWIO int8 conv. Activation scale: dynamic per-tensor abs-max,
    or a calibrated ``static_amax`` (the quantize pass then has no reduction
    to wait on and fuses into the previous op's epilogue)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf)) if static_amax is None else static_amax
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    wq, wscale = quantize_weights(kernel)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        xq, wq,
        window_strides=tuple(strides),
        padding=_pad_pairs(padding, len(strides)),
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (ascale * wscale)
    return out.astype(out_dtype or x.dtype)


def calibrate_scales(model, variables, batches, max_batches: int = 8):
    """Collect per-conv activation abs-max statistics for static int8 scales.

    Runs the model (built with ``quantize='int8'``) on up to ``max_batches``
    input batches with the ``quant`` collection mutable: every
    QuantizableConv records its running input amax while computing the exact
    float output (models/resnet.py). Returns the ``quant`` collection to pass
    back into apply (e.g. ``{**variables, "quant": scales}``) — convs then
    use static scales.

    ``batches`` yields dicts with the model's input keys (extra keys like
    targets are ignored).
    """
    import jax

    input_keys = ("src_sketch", "src_video", "src_sketch_mask",
                  "src_video_mask")

    # jit the calibration forward — un-jitted apply is unusably slow on the
    # tunneled backend (compiles once for the no-quant first batch, once for
    # the quant-carrying rest)
    @jax.jit
    def calib_step(vars_in, inputs):
        return model.apply(vars_in, **inputs, train=False, mutable=["quant"])

    quant = None
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        vars_in = dict(variables)
        if quant is not None:
            vars_in["quant"] = quant
        _, mutated = calib_step(vars_in, {k: batch[k] for k in input_keys})
        quant = mutated["quant"]
    if quant is None:
        raise ValueError("calibration got zero batches")
    return quant
