"""Fused FFN Pallas kernel: dense -> exact gelu -> dense, one HBM pass.

XLA runs the BERT FFN pair as two GEMMs with the (M, intermediate)
activation materialized in HBM between them (plus a separate gelu loop
fusion): measured 5.35 ms at (M=65536, 768->3072->768, bf16) vs a
3.13 ms pure-GEMM floor on v5e.  This kernel keeps the intermediate in
VMEM — the GEMMs read/write HBM exactly once for x, y, and the weights.

Differentiable via custom VJP: the backward recomputes the reference
(XLA) forward and uses its VJP — correct for training, while the fast
kernel serves the inference/extraction hot path (reference equivalent:
the BertIntermediate/BertOutput pair inside
``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``'s trunk).

Numerics: GEMMs accumulate in fp32 from bf16 inputs, gelu (erf form,
matching HF's "gelu") computed in fp32, intermediate stored bf16 —
the same dtype discipline as the unfused bf16 path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| < 1.5e-7 in fp32).

    Mosaic has no erf/erfc lowering; 1.5e-7 absolute error is ~4 orders
    of magnitude below bf16 resolution, so the fused gelu is
    indistinguishable from the exact-erf XLA path at the stored dtype.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_new(x):
    """tanh-form gelu (HF "gelu_new"), exactly as jax.nn.gelu(approximate=True)."""
    c = (2.0 / jnp.pi) ** 0.5
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    x = x_ref[...]                                     # (bm, H) input dtype
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)                # (bm, I) fp32
    if act == "gelu":
        # erf-form gelu (matches HF "gelu"), erf approximated in-kernel
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    else:
        assert act == "gelu_new", act
        h = _gelu_new(h)
    h = h.astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)                # (bm, H) fp32
    o_ref[...] = y.astype(o_ref.dtype)


# Mosaic compiles these kernels only while the per-program working set fits
# scoped VMEM; past it, compilation FAILS (the round-4 all-heads inference
# flash kernel broke the ProtSTonKGs forward exactly this way — see
# flash_attention.infer_kernel_fits).  Calibration points measured on v5e:
# BERT-base (bm=512, 768→3072, bf16) ≈ 24 MB by this model and compiles;
# ProtBERT (1024→4096) ≈ 36 MB and compiles; the all-heads flash kernel's
# ~56 MB working set does NOT compile.  48 MB splits the measured
# pass/fail shapes with margin on both sides.
_FFN_VMEM_BUDGET = 48 * 1024 * 1024

# Mosaic also enforces a SEPARATE ~16 MB scoped-VMEM limit that fp32 inputs
# blow at every viable row block (measured on v5e, round 5, exposed by the
# fp32 numerics pass of bench_bucketed_extract): the LN-block kernel at
# (768→3072) fails with "Scoped allocation with size 20.73M / limit 16.00M"
# at bm=512 AND "16.25M / 16.00M" at bm=256 — while bf16 at the same shapes
# compiles.  A bm-scaled stack model mispredicted the bm=256 point by 5 MB
# (fp32 doubles both the kernel-body temporaries and the pipelined block
# buffers at once), so rather than carry an unreliable model for a path
# that buys nothing, the gate is categorical: the fused kernels are
# bf16-path optimizations; fp32 compute always takes the unfused
# identical-numerics XLA chain (fp32 runs exist only for numerics
# validation, where the fusion's HBM savings are irrelevant).


def ffn_kernel_fits(block_m: int, H: int, I: int, *, itemsize: int = 2,
                    with_ln_block: bool = False) -> bool:
    """Whether the fused-FFN kernel's per-program working set fits VMEM.

    Counts: both weight matrices (constant-index blocks, single-buffered —
    fetched once and resident), the varying input/output row blocks
    (double-buffered by the Mosaic pipeline; the LN-block variant reads an
    extra attn_out input), the fp32 (bm, I) intermediate plus its cast,
    and the fp32 (bm, H) pre-cast output — against the 48 MB budget
    calibrated on measured bf16 pass/fail shapes above.  Itemsize > 2 is
    rejected outright (measured scoped-VMEM failures at every viable row
    block; see the round-5 note above)."""
    if itemsize > 2:
        return False
    weights = 2 * H * I * itemsize
    n_io = 3 if with_ln_block else 2
    io = 2 * n_io * block_m * H * itemsize
    inter = block_m * I * (4 + itemsize)
    f32_out = block_m * H * 4
    return weights + io + inter + f32_out <= _FFN_VMEM_BUDGET


def _pick_block_m(block_m: int, M: int, H: int, I: int, *, itemsize: int,
                  with_ln_block: bool) -> Optional[int]:
    """Largest fitting row-block ≤ block_m, or None if nothing fits.

    Shrinking bm trades pipeline efficiency for VMEM; below 128 rows the
    GEMMs under-fill the MXU and the fused kernel stops paying for itself,
    so callers fall back to the unfused XLA path instead."""
    bm = min(block_m, M)
    if ffn_kernel_fits(bm, H, I, itemsize=itemsize,
                       with_ln_block=with_ln_block):
        return bm
    bm //= 2
    while bm >= 128:
        if ffn_kernel_fits(bm, H, I, itemsize=itemsize,
                           with_ln_block=with_ln_block):
            return bm
        bm //= 2
    return None


def _ffn_call(x, w1, b1, w2, b2, act: str, block_m: int,
              interpret: Optional[bool]):
    orig_shape = x.shape
    H = orig_shape[-1]
    I = w1.shape[-1]
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    bm = min(block_m, M)
    M_pad = -(-M // bm) * bm
    if M_pad != M:
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act=act),
        grid=(M_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # constant index: weights are fetched once and stay resident
            pl.BlockSpec((H, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, H), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * M_pad * H * I,
            bytes_accessed=(2 * M_pad * H + 2 * H * I) * x.dtype.itemsize,
            transcendentals=M_pad * I,
        ),
        interpret=interpret,
    )(x2, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2)
    return out[:M].reshape(orig_shape)


def _ffn_reference(x, w1, b1, w2, b2, act: str = "gelu"):
    """Unfused XLA forward with identical dtype discipline (bwd + tests)."""
    h = (
        jnp.einsum("...i,io->...o", x, w1.astype(x.dtype)).astype(jnp.float32)
        + b1.astype(jnp.float32)
    )
    h = jax.nn.gelu(h, approximate=(act == "gelu_new")).astype(x.dtype)
    y = (
        jnp.einsum("...i,io->...o", h, w2.astype(x.dtype)).astype(jnp.float32)
        + b2.astype(jnp.float32)
    )
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused backward kernel: recompute + dgelu + dx in one pass, dW GEMMs in XLA
# ---------------------------------------------------------------------------

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# How the backward chooses its implementation ("auto" | "kernel" | "xla").
# "auto" = the Pallas kernel on real TPU when the working set fits, the XLA
# recompute chain otherwise (and always under interpret/CPU, where the
# kernel emulation is slow); tests override to "kernel" to exercise the
# kernel's numerics in interpret mode.
BWD_IMPL = "auto"


def _ffn_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dh_ref, a_ref, *, act: str):
    """One row-block of the FFN backward's activation side.

    Recomputes h = x@w1 + b1 and a = gelu(h) from the saved input (the
    fp32 (bm, I) chains live only in VMEM — same recompute contract as
    the XLA ``_fused_ffn_bwd`` chain it replaces), applies the dgelu on
    the g@W2ᵀ GEMM's output in-register, and emits dx plus the two bf16
    dW GEMM operands (dh, a).  The dW GEMMs and db sums run in XLA on
    the emitted operands: Mosaic allocates
    constant-index output accumulators on the ~16 MB scoped-VMEM stack,
    and two full (H, I) fp32 accumulators are 18.87 MB — measured on v5e
    as an immovable 18.01 MiB scoped failure at ANY row block or dot
    chunking, so in-kernel dW accumulation is impossible at BERT shapes."""
    f32 = jnp.float32
    x = x_ref[...]                                     # (bm, H) input dtype
    g = g_ref[...]                                     # (bm, H) cotangent
    h = jax.lax.dot_general(                           # recompute, fp32
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[...].astype(f32)
    if act == "gelu":
        e = _erf(h * _INV_SQRT2)
        a = 0.5 * h * (1.0 + e)
        dact = 0.5 * (1.0 + e) + h * _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
    else:
        assert act == "gelu_new", act
        c = (2.0 / jnp.pi) ** 0.5
        u = jnp.tanh(c * (h + 0.044715 * h * h * h))
        a = 0.5 * h * (1.0 + u)
        dact = (0.5 * (1.0 + u)
                + 0.5 * h * (1.0 - u * u) * c * (1.0 + 3 * 0.044715 * h * h))
    a_ref[...] = a.astype(a_ref.dtype)
    # dh = (g @ W2ᵀ) ⊙ gelu'(h) — the dgelu rides the GEMM, in VMEM
    dh32 = jax.lax.dot_general(
        g, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32) * dact
    dh = dh32.astype(dh_ref.dtype)  # the unfused chain's bf16 einsum cotangent
    dh_ref[...] = dh
    dx = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


_MOSAIC_SCOPED_VMEM = 16 * 1024 * 1024


def ffn_bwd_kernel_fits(block_m: int, H: int, I: int, *,
                        itemsize: int = 2) -> bool:
    """Whether the backward kernel's working set fits Mosaic's limits.

    Two budgets, same model as ``infer_kernel_fits``/``ffn_kernel_fits``:
    the ~16 MB scoped-VMEM limit is charged 4× the pipelined blocks —
    x, g, dx (bm, H) plus the emitted dh, a (bm, I); Mosaic multi-buffers
    4-deep at realistic grids — plus the kernel-body temporaries (the
    fp32 elementwise chains, charged 12 bytes per (bm, I) element: fp32
    h/dh32 + their bf16 casts; the rest fuses into the dots).  The 48 MB
    total budget additionally holds the resident weights.  fp32 inputs
    are rejected outright like the forward kernels (bf16-path
    optimization; see the round-5 note above)."""
    if itemsize > 2:
        return False
    pipelined = 4 * (3 * block_m * H * itemsize
                     + 2 * block_m * I * itemsize)
    temps = block_m * I * 12
    if pipelined + temps > _MOSAIC_SCOPED_VMEM:
        return False
    resident = 2 * H * I * itemsize + (H + I) * 4
    return pipelined + temps + resident <= _FFN_VMEM_BUDGET


def _pick_bwd_block_m(M: int, H: int, I: int, *, itemsize: int,
                      block_m: int = 512):
    bm = min(block_m, M)
    while bm >= 128:
        if ffn_bwd_kernel_fits(bm, H, I, itemsize=itemsize):
            return bm
        bm //= 2
    return None


def _ffn_bwd_call(x, w1, b1, w2, b2, g, act: str, bm: int, interpret: bool):
    orig_shape = x.shape
    H = orig_shape[-1]
    I = w1.shape[-1]
    x2 = x.reshape(-1, H)
    g2 = g.reshape(-1, H).astype(x.dtype)
    M = x2.shape[0]
    bm = min(bm, M)
    M_pad = -(-M // bm) * bm
    if M_pad != M:
        # zero rows are exact no-ops for every gradient: g=0 zeroes the
        # dW2/db2/dh chain and x=0 zeroes dW1; padded dx rows are sliced off
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
        g2 = jnp.pad(g2, ((0, M_pad - M), (0, 0)))
    n_blocks = M_pad // bm
    row = lambda i: (i, 0)          # noqa: E731
    const2 = lambda i: (0, 0)       # noqa: E731
    const1 = lambda i: (0,)         # noqa: E731
    f32 = jnp.float32
    dx, dh, a = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, act=act),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, I), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((I, H), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, I), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, I), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M_pad, H), x.dtype),
            jax.ShapeDtypeStruct((M_pad, I), x.dtype),
            jax.ShapeDtypeStruct((M_pad, I), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * M_pad * H * I,                   # 3 in-kernel GEMMs
            bytes_accessed=(3 * M_pad * H + 2 * M_pad * I + 2 * H * I)
            * x.dtype.itemsize,
            transcendentals=2 * M_pad * I,
        ),
        interpret=interpret,
    )(x2, g2, w1.astype(x.dtype), b1, w2.astype(x.dtype))
    # the two dW GEMMs run in XLA on the kernel-emitted bf16 operands —
    # in-kernel (H, I) fp32 accumulators cannot fit scoped VMEM (docstring)
    dw1 = jax.lax.dot_general(x2, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dw2 = jax.lax.dot_general(a, g2, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = jnp.sum(dh.astype(f32), axis=0)
    db2 = jnp.sum(g2.astype(f32), axis=0)
    return (dx[:M].reshape(orig_shape),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_ffn(x, w1, b1, w2, b2, act, block_m, interpret):
    return _ffn_call(x, w1, b1, w2, b2, act, block_m, interpret)


def _fused_ffn_fwd(x, w1, b1, w2, b2, act, block_m, interpret):
    return (_ffn_call(x, w1, b1, w2, b2, act, block_m, interpret),
            (x, w1, b1, w2, b2))


def _fused_ffn_bwd(act, block_m, interpret, res, g):
    # Recompute backward: the bf16[L, B, S, 4H] intermediates exist in
    # NEITHER direction — this is what lets attention-remat training drop
    # its dominant HBM buffers.  On real TPU the recompute + all five
    # backward GEMMs run as ONE Pallas kernel (the (M, I) chains never
    # reach HBM); the unfused XLA chain is the fallback and the
    # interpret/CPU path.
    x, w1, b1, w2, b2 = res
    impl = BWD_IMPL
    if impl == "auto" and not interpret:
        H, I = w1.shape[-2], w1.shape[-1]
        M = 1
        for d in x.shape[:-1]:
            M *= d
        if _pick_bwd_block_m(max(M, 1), H, I,
                             itemsize=x.dtype.itemsize) is not None:
            impl = "kernel"
    if impl == "kernel":
        H, I = w1.shape[-2], w1.shape[-1]
        M = 1
        for d in x.shape[:-1]:
            M *= d
        if interpret:
            bm = min(block_m, max(M, 1))
        else:
            bm = _pick_bwd_block_m(max(M, 1), H, I, itemsize=x.dtype.itemsize)
            assert bm is not None
        return _ffn_bwd_call(x, w1, b1, w2, b2, g, act, bm, interpret)
    _, vjp = jax.vjp(lambda *a: _ffn_reference(*a, act=act), *res)
    return vjp(g)


_fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def fused_ffn(
    x: Array,          # (..., H)
    w1: Array,         # (H, I)
    b1: Array,         # (I,)
    w2: Array,         # (I, H)
    b2: Array,         # (H,)
    *,
    act: str = "gelu",
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> Array:
    """dense(H->I) -> gelu/gelu_new -> dense(I->H), intermediate in VMEM.

    Gated by the kernel's VMEM working set (:func:`ffn_kernel_fits`):
    shapes whose weights + row blocks + fp32 intermediate exceed scoped
    VMEM run the unfused XLA path instead of failing Mosaic compilation.
    The gate only applies to real Mosaic compiles — interpret mode (CPU
    tests) emulates the kernel without VMEM limits and honors any block."""
    H, I = w1.shape[-2], w1.shape[-1]
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    if interpret:
        bm = min(block_m, max(M, 1))
    else:
        bm = _pick_block_m(block_m, max(M, 1), H, I,
                           itemsize=x.dtype.itemsize, with_ln_block=False)
    if bm is None:
        return _ffn_reference(x, w1, b1, w2, b2, act=act)
    return _fused_ffn(x, w1, b1, w2, b2, act, bm, interpret)


# ---------------------------------------------------------------------------
# Whole post-attention half of a post-LN encoder layer, in one kernel
# ---------------------------------------------------------------------------

def _ln_rows(xs, scale, bias, eps):
    """LayerNorm over the last axis, fp32 in / fp32 out (kernel helper)."""
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _ffn_ln_kernel(x_ref, a_ref, g1_ref, be1_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, g2_ref, be2_ref, o_ref,
                   *, act: str, eps: float):
    f32 = jnp.float32
    # LN1(x + attn_out) — residual add + statistics in fp32, stored bf16
    # (matches models.bert._layer_norm's promote-then-cast discipline)
    xs = x_ref[...].astype(f32) + a_ref[...].astype(f32)
    x2 = _ln_rows(xs, g1_ref[...].astype(f32), be1_ref[...].astype(f32),
                  eps).astype(x_ref.dtype)
    # FFN: dense -> gelu -> dense, (bm, I) intermediate never leaves VMEM
    h = jax.lax.dot_general(
        x2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[...].astype(f32)
    if act == "gelu":
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    else:
        assert act == "gelu_new", act
        h = _gelu_new(h)
    h = h.astype(x_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[...].astype(f32)
    ff = y.astype(x_ref.dtype)
    # LN2(x2 + ff)
    xs2 = x2.astype(f32) + ff.astype(f32)
    out = _ln_rows(xs2, g2_ref[...].astype(f32), be2_ref[...].astype(f32),
                   eps)
    o_ref[...] = out.astype(o_ref.dtype)


def _block_ref_chain(x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2,
                     ln2_scale, ln2_bias, *, act: str, eps: float):
    """The unfused LN1(x+attn) -> FFN -> LN2 chain in plain JAX.

    Same cast discipline as the kernel (fp32 statistics/accumulation,
    activations stored in x.dtype).  Used only by the custom VJP's
    backward pass, which recomputes through this chain instead of saving
    kernel intermediates."""
    f32 = jnp.float32
    dt = x.dtype

    def ln(y32, scale, bias):
        m = jnp.mean(y32, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(y32 - m), axis=-1, keepdims=True)
        yh = (y32 - m) * jax.lax.rsqrt(v + eps)
        return yh * scale.astype(f32) + bias.astype(f32)

    x2 = ln(x.astype(f32) + attn_out.astype(f32),
            ln1_scale, ln1_bias).astype(dt)
    h = jnp.dot(x2, w1.astype(dt), preferred_element_type=f32) \
        + b1.astype(f32)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = _gelu_new(h)
    ff = (jnp.dot(h.astype(dt), w2.astype(dt), preferred_element_type=f32)
          + b2.astype(f32)).astype(dt)
    out = ln(x2.astype(f32) + ff.astype(f32), ln2_scale, ln2_bias)
    return out.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _fused_block(x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2,
                 ln2_scale, ln2_bias, act, eps, block_m, interpret):
    return _fused_block_fwd(x, attn_out, ln1_scale, ln1_bias, w1, b1,
                            w2, b2, ln2_scale, ln2_bias,
                            act, eps, block_m, interpret)[0]


def _fused_block_fwd(x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2,
                     ln2_scale, ln2_bias, act, eps, block_m, interpret):
    out = _fused_block_call(x, attn_out, ln1_scale, ln1_bias, w1, b1,
                            w2, b2, ln2_scale, ln2_bias,
                            act=act, eps=eps, block_m=block_m,
                            interpret=interpret)
    return out, (x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2,
                 ln2_scale, ln2_bias)


def _fused_block_bwd(act, eps, block_m, interpret, res, g):
    # Recompute-based backward: differentiate the unfused reference chain
    # from the saved INPUTS (cheap bf16 tensors; no kernel intermediates
    # are ever stored).  Gradients come back in each argument's own dtype.
    _, vjp = jax.vjp(
        functools.partial(_block_ref_chain, act=act, eps=eps), *res)
    return vjp(g)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_ffn_ln_block(
    x: Array,          # (..., H) layer input (pre-attention residual)
    attn_out: Array,   # (..., H) attention output-projection result
    ln1_scale: Array, ln1_bias: Array,   # post-attention LayerNorm
    w1: Array, b1: Array,                # intermediate dense (H, I)
    w2: Array, b2: Array,                # output dense (I, H)
    ln2_scale: Array, ln2_bias: Array,   # post-FFN LayerNorm
    *,
    act: str = "gelu",
    eps: float = 1e-12,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> Array:
    """LN1(x+attn) -> dense -> gelu -> dense -> LN2(res+ff), one HBM pass.

    The entire post-attention half of a post-LN BERT layer
    (reference semantics: ``BertSelfOutput``/``BertIntermediate``/
    ``BertOutput`` inside the trunk at
    ``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``) as a
    single Pallas kernel: the LN'd residual ``x2`` and the (M, I) FFN
    intermediate never reach HBM, and both LayerNorm VPU passes ride the
    GEMM pipeline.  vs the unfused chain this removes ~500 MB of HBM
    traffic per trunk layer at M=65536 (two LN read/modify/write passes +
    the x2 round trip).

    Aimed at inference (the deterministic encoder tail, where dropout is
    a no-op and nothing sits between the fused stages), but DIFFERENTIABLE:
    a custom VJP recomputes gradients through the equivalent unfused chain
    from the saved inputs, so deterministic forwards under ``jax.grad``
    (frozen-backbone ablations, benchmark probes) stay correct — at
    unfused-recompute cost, which real training never pays because its
    dropout path uses ``fused_ffn`` + explicit LayerNorms instead.
    Numerics: identical cast discipline to the unfused path (fp32
    statistics, bf16 stored activations).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    H, I = w1.shape[-2], w1.shape[-1]
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if interpret:
        # interpret mode (CPU tests) has no Mosaic VMEM limits
        bm = min(block_m, max(M, 1))
    else:
        bm = _pick_block_m(block_m, max(M, 1), H, I,
                           itemsize=x.dtype.itemsize, with_ln_block=True)
    if bm is None:
        # working set exceeds scoped VMEM at every viable row block —
        # run the identical-numerics unfused chain instead of failing
        # Mosaic compilation (same gate-or-fallback contract as
        # flash_attention.infer_kernel_fits)
        return _block_ref_chain(x, attn_out, ln1_scale, ln1_bias, w1, b1,
                                w2, b2, ln2_scale, ln2_bias,
                                act=act, eps=float(eps))
    return _fused_block(x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2,
                        ln2_scale, ln2_bias, act, float(eps), bm,
                        interpret)


def _fused_block_call(
    x: Array,
    attn_out: Array,
    ln1_scale: Array, ln1_bias: Array,
    w1: Array, b1: Array,
    w2: Array, b2: Array,
    ln2_scale: Array, ln2_bias: Array,
    *,
    act: str,
    eps: float,
    block_m: int,
    interpret: bool,
) -> Array:
    orig_shape = x.shape
    H = orig_shape[-1]
    I = w1.shape[-1]
    x2 = x.reshape(-1, H)
    a2 = attn_out.reshape(-1, H).astype(x.dtype)
    M = x2.shape[0]
    bm = min(block_m, M)
    M_pad = -(-M // bm) * bm
    if M_pad != M:
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
        a2 = jnp.pad(a2, ((0, M_pad - M), (0, 0)))
    row = lambda i: (i, 0)          # noqa: E731
    const2 = lambda i: (0, 0)       # noqa: E731
    const1 = lambda i: (0,)         # noqa: E731
    out = pl.pallas_call(
        functools.partial(_ffn_ln_kernel, act=act, eps=float(eps)),
        grid=(M_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, I), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((I, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, H), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, H), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * M_pad * H * I,
            bytes_accessed=(3 * M_pad * H + 2 * H * I) * x.dtype.itemsize,
            transcendentals=M_pad * I,
        ),
        interpret=interpret,
    )(x2, a2, ln1_scale, ln1_bias, w1.astype(x.dtype), b1,
      w2.astype(x.dtype), b2, ln2_scale, ln2_bias)
    return out[:M].reshape(orig_shape)
