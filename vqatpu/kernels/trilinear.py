"""TPU kernels for the CTI hot path: Pallas where it wins, XLA where the
compiler already does the right thing.

Engineering notes (measured on TPU v5e, jax 0.9 / Mosaic):

- The PARALIND rank contraction (``tc.py:41-52``) is a chain of tensor-mode
  products.  Mode shuffles between contractions require lane-splitting
  relayouts ("unsupported shape cast" in Mosaic), so hand-fusing the whole
  chain in one Pallas kernel is counterproductive; instead
  :func:`attention_logits_xla` fixes the *contraction order* so the largest
  intermediate is [B, Q, A, rank, h_sub, G] (~75 MB at batch 256) instead of
  the naive [B, Q, rank, h_sub, h_sub, G] (~200 MB), and XLA fuses the rest.
- The flattened masked softmax over V*Q*A per glimpse IS a clean Pallas fit:
  one pass over [G, V, Q*A] blocks per sample with mask, max, exp, sum, and
  divide fused (``_softmax_kernel``).
- The 4-operand weighted pooling ``einsum('bdv,bvqa,bdq,bda->bd')``
  (``tc.py:59``) is bandwidth-bound with a [B, V, A, D] HBM intermediate in
  the einsum path; the Pallas kernel keeps everything per-sample in VMEM
  (``_tri_pool_kernel``).  Host passes ``w`` pre-reshaped [B, V*Q, A] so the
  kernel only ever splits leading (sublane) dims, which Mosaic supports.

Both Pallas entry points carry ``jax.custom_vjp`` with factored-einsum
backward passes, so they are training-safe.

Measured verdicts live in PROFILE.md.  Headlines: the A-then-Q-then-V
contraction order is measured-fastest (5.1 vs 11.4/23.4 ms r1); the
r2 lane-efficiency relayout (:func:`attention_logits_dg` /
:func:`attention_logits_gqav` — keep every big intermediate's minor axis
wide for the (8,128) VMEM tiling) took the chain 5.7 -> 2.6 ms and is the
production path; the Pallas kernels are numerics-validated on-chip but
lose to XLA at every measured shape, so ``kernel_backend="xla"`` stays
default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


# ---------------------------------------------------------------------------
# XLA implementations (reference math; fallback and backward building blocks)
# ---------------------------------------------------------------------------

def attention_logits_xla(v_r, q_r, a_r, T):
    """v_r [B,V,R,X], q_r [B,Q,R,Y], a_r [B,A,R,Z], T [R,X,Y,Z,G]
    -> logits [B,V,Q,A,G].

    NAMING NOTE: since r2 the PRODUCTION '_xla'-backend entry points
    (``trilinear_attention_xla``, ``TriAttention(backend='xla')``) route
    through :func:`attention_logits_dg`, the hand-laid-out dot_general
    relayout.  This einsum variant survives as the readable oracle for tests
    and as the A/B baseline — benchmarks of "the einsum path" must call it
    directly.

    Contraction order: contract the small A axis into T first, then Q, then
    the MXU-friendly [V, R*X] x [R*X, Q*A*G] GEMM last.
    """
    ta = jnp.einsum("blrz,rxyzg->blrxyg", a_r, T)     # [B,A,R,X,Y,G]
    tqa = jnp.einsum("bjry,blrxyg->bjlrxg", q_r, ta)  # [B,Q,A,R,X,G]
    return jnp.einsum("birx,bjlrxg->bijlg", v_r, tqa)


def attention_logits_blockdiag(v_r, q_r, a_r, T):
    """Variant of :func:`attention_logits_xla` whose first mode product runs
    as ONE dense GEMM against a block-diagonal expansion of T.

    The standard path contracts ``a_r x T`` batched over R with K=Z=16 — 32
    skinny GEMMs plus relayouts.  Embedding T as [R*Z, R*X*Y*G] block-diag
    (zeros off the R diagonal) wastes 31/32 of the MACs but turns the step
    into a single [B*A, 512] x [512, 16k] GEMM with the output already in
    the layout the next contraction wants."""
    R, X, Y, Z, G = T.shape
    eye = jnp.eye(R, dtype=T.dtype)
    T_bd = jnp.einsum("rxyzg,rs->rzsxyg", T, eye).reshape(R * Z, R * X * Y * G)
    B, A = a_r.shape[0], a_r.shape[1]
    ta = (a_r.reshape(B * A, R * Z) @ T_bd).reshape(B, A, R, X, Y, G)
    tqa = jnp.einsum("bjry,blrxyg->bjlrxg", q_r, ta)
    return jnp.einsum("birx,bjlrxg->bijlg", v_r, tqa)


def attention_logits_dg(v_r, q_r, a_r, T):
    """Hand-laid-out dot_general variant of :func:`attention_logits_xla`.

    TPU VMEM tiles are (8, 128): an array whose minor axis is 16 wastes
    7/8 of every lane.  This version picks the axis orders so each big
    intermediate keeps a >=96-wide minor dim ((y,x,g) packed 512-wide out
    of the first GEMM; (a,g,x) 96-wide out of the second), accepting two
    explicit relayouts where the contraction structure forces a small
    minor.  Measured vs the einsum path in profile_cti stage ``chain4``."""
    B, V, R, X = v_r.shape
    Q = q_r.shape[1]
    A = a_r.shape[1]
    Z, Y, G = T.shape[3], T.shape[2], T.shape[4]
    # step 1: ta[r, b*a, (y x g)] — one batched GEMM, 512-wide minor out
    a2 = jnp.transpose(a_r, (2, 0, 1, 3)).reshape(R, B * A, Z)
    T2 = jnp.transpose(T, (0, 3, 2, 1, 4)).reshape(R, Z, Y * X * G)
    ta = jax.lax.dot_general(a2, T2, (((2,), (1,)), ((0,), (0,))))
    # step 2: contract y, batch (r, b): relayout to [R*B, Y, A*X*G]
    ta = ta.reshape(R, B, A, Y, X * G)
    ta = jnp.transpose(ta, (0, 1, 3, 2, 4)).reshape(R * B, Y, A * X * G)
    q2 = jnp.transpose(q_r, (2, 0, 1, 3)).reshape(R * B, Q, Y)
    tqa = jax.lax.dot_general(q2, ta, (((2,), (1,)), ((0,), (0,))))
    # step 3: contract (r, x), batch b: relayout to [B, R*X, Q*A*G]
    tqa = tqa.reshape(R, B, Q, A, X, G)
    tqa = jnp.transpose(tqa, (1, 0, 4, 2, 3, 5)).reshape(B, R * X, Q * A * G)
    v2 = v_r.reshape(B, V, R * X)
    out = jax.lax.dot_general(v2, tqa, (((2,), (1,)), ((0,), (0,))))
    return out.reshape(B, V, Q, A, G)


def attention_logits_gqav(v_r, q_r, a_r, T):
    """As :func:`attention_logits_dg` but emits [B, G, Q, A, V] — V-minor,
    so the downstream softmax and pooling never touch a 2- or 3-wide minor
    axis (the [B,V,Q,A,G] layout pays ~60x lane waste on every elementwise
    pass over the attention tensor)."""
    B, V, R, X = v_r.shape
    Q = q_r.shape[1]
    A = a_r.shape[1]
    Z, Y, G = T.shape[3], T.shape[2], T.shape[4]
    a2 = jnp.transpose(a_r, (2, 0, 1, 3)).reshape(R, B * A, Z)
    T2 = jnp.transpose(T, (0, 3, 2, 1, 4)).reshape(R, Z, Y * X * G)
    ta = jax.lax.dot_general(a2, T2, (((2,), (1,)), ((0,), (0,))))
    ta = ta.reshape(R, B, A, Y, X * G)
    ta = jnp.transpose(ta, (0, 1, 3, 2, 4)).reshape(R * B, Y, A * X * G)
    q2 = jnp.transpose(q_r, (2, 0, 1, 3)).reshape(R * B, Q, Y)
    tqa = jax.lax.dot_general(q2, ta, (((2,), (1,)), ((0,), (0,))))
    tqa = tqa.reshape(R, B, Q, A, X, G)
    tqa = jnp.transpose(tqa, (1, 0, 4, 2, 3, 5)).reshape(B, R * X, Q * A * G)
    v2 = v_r.reshape(B, V, R * X)
    # lhs/rhs swapped vs _dg: output [B, Q*A*G, V] keeps V minor
    out = jax.lax.dot_general(tqa, v2, (((1,), (2,)), ((0,), (0,))))
    return jnp.transpose(out.reshape(B, Q, A, G, V), (0, 3, 1, 2, 4))


def masked_softmax_gqav(logits, v_mask):
    """Masked softmax over (Q, A, V) per glimpse for the [B, G, Q, A, V]
    layout (same math as :func:`masked_softmax_vqa_xla`)."""
    mask5 = v_mask[:, None, None, None, :]
    neg = jnp.where(mask5, logits, NEG_BIG)
    m = jnp.max(neg, axis=(2, 3, 4), keepdims=True)
    e = jnp.exp(neg - m) * mask5
    return e / jnp.maximum(e.sum(axis=(2, 3, 4), keepdims=True), 1e-30)


def trilinear_pool_qav(vt, qt, at, w):
    """Pooling with V-minor attention: ``w`` [B, Q, A, V] (one glimpse of
    the gqav layout).  Every tensor the big passes touch keeps a >=50-wide
    minor (the [B,V,Q,A] path reads ``w`` through a 3-wide minor)."""
    B, Q, A, V = w.shape
    D = vt.shape[-1]
    wv = jax.lax.dot_general(w.reshape(B, Q * A, V), vt,
                             (((2,), (1,)), ((0,), (0,))))  # [B, QA, D]
    wv = wv.reshape(B, Q, A, D)
    m = (wv * qt[:, :, None, :]).sum(axis=1)  # [B, A, D]
    return (m * at).sum(axis=1)               # [B, D]


def masked_softmax_vqa_xla(logits, v_mask):
    """Flattened softmax over (V,Q,A) per glimpse with masked boxes zeroed
    (``attention.py:55-58``)."""
    mask5 = v_mask[:, :, None, None, None]
    neg = jnp.where(mask5, logits, NEG_BIG)
    m = jnp.max(neg, axis=(1, 2, 3), keepdims=True)
    e = jnp.exp(neg - m) * mask5
    return e / jnp.maximum(e.sum(axis=(1, 2, 3), keepdims=True), 1e-30)


def trilinear_attention_xla(v_r, q_r, a_r, T, v_mask):
    return masked_softmax_vqa_xla(attention_logits_dg(v_r, q_r, a_r, T), v_mask)


def trilinear_pool_xla(vt, qt, at, w):
    """vt [B,V,D], qt [B,Q,D], at [B,A,D], w [B,V,Q,A] -> [B,D].

    Contraction order: V first (the largest contracted axis makes the best
    GEMM K-dim; measured 1.1 vs 2.1 ms fwd+bwd for the q-first order at
    reference shapes, equal accuracy vs a float64 oracle)."""
    wv = jnp.einsum("bvqa,bvd->bqad", w, vt)
    m = jnp.einsum("bqad,bqd->bad", wv, qt)
    return jnp.einsum("bad,bad->bd", m, at)


# ---------------------------------------------------------------------------
# Pallas: fused masked softmax over [G, V, Q*A] per sample
# ---------------------------------------------------------------------------

def _softmax_kernel(V, QA):
    def kernel(logits_ref, mask_ref, out_ref):
        # logits [1, 1, V, QA]; mask [1, V, 1]; out [1, 1, V, QA]
        # Pure 2-D ops per (batch, glimpse) program — higher-rank values and
        # rank-1 intermediates trip Mosaic layout inference on this target.
        x = logits_ref[0, 0]       # [V, QA]
        mask2 = mask_ref[0]        # [V, 1]
        neg = jnp.where(mask2 > 0, x, jnp.float32(NEG_BIG))
        m = jnp.max(neg)
        e = jnp.exp(neg - m) * mask2
        denom = jnp.maximum(jnp.sum(e), 1e-30)
        out_ref[0, 0] = e / denom
    return kernel


def masked_softmax_vqa_pallas(logits, v_mask):
    """logits [B,V,Q,A,G], v_mask [B,V] -> softmax over (V,Q,A) per g."""
    B, V, Q, A, G = logits.shape
    lg = jnp.transpose(logits, (0, 4, 1, 2, 3)).reshape(B, G, V, Q * A)
    out = pl.pallas_call(
        _softmax_kernel(V, Q * A),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, 1, V, Q * A), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 1), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, V, Q * A), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, V, Q * A), jnp.float32),
    )(lg, v_mask.astype(jnp.float32)[:, :, None])
    return jnp.transpose(out.reshape(B, G, V, Q, A), (0, 2, 3, 4, 1))


@jax.custom_vjp
def _masked_softmax_pallas_vjp(logits, v_mask):
    return masked_softmax_vqa_pallas(logits, v_mask)


def _softmax_fwd(logits, v_mask):
    att = masked_softmax_vqa_pallas(logits, v_mask)
    return att, att


def _softmax_bwd(att, g):
    # d softmax: att * (g - sum(g * att)); masked entries have att == 0
    dot = jnp.sum(g * att, axis=(1, 2, 3), keepdims=True)
    return att * (g - dot), None


_masked_softmax_pallas_vjp.defvjp(_softmax_fwd, _softmax_bwd)


def trilinear_attention(v_r, q_r, a_r, T, v_mask, backend: str = "xla"):
    """Rank-decomposed trilinear attention: logits + masked softmax."""
    logits = attention_logits_dg(v_r, q_r, a_r, T)
    if backend == "pallas":
        return _masked_softmax_pallas_vjp(logits, v_mask)
    return masked_softmax_vqa_xla(logits, v_mask)


# ---------------------------------------------------------------------------
# Pallas: fused rank-contraction GEMM + masked softmax (VERDICT r1 #9)
# ---------------------------------------------------------------------------

def _rank_softmax_kernel(V, QA):
    def kernel(vr_ref, w_ref, mask_ref, out_ref):
        # vr [1, V, RX]; w [1, 1, RX, QA]; mask [1, V, 1]; out [1, 1, V, QA]
        # One program per (batch, glimpse): the final PARALIND contraction is
        # a single [V, RX] x [RX, QA] MXU GEMM whose result never leaves
        # VMEM — max/exp/sum/divide happen in place (the XLA path round-trips
        # the [B, V, Q, A, G] logits through HBM between the einsum and the
        # softmax).  All ops 2-D per the Mosaic notes in the module docstring.
        vr = vr_ref[0]                       # [V, RX]
        w = w_ref[0, 0]                      # [RX, QA]
        logits = jnp.dot(vr, w, preferred_element_type=jnp.float32)
        mask2 = mask_ref[0]                  # [V, 1]
        neg = jnp.where(mask2 > 0, logits, jnp.float32(NEG_BIG))
        m = jnp.max(neg)
        e = jnp.exp(neg - m) * mask2
        den = jnp.maximum(jnp.sum(e), 1e-30)
        out_ref[0, 0] = e / den
    return kernel


def _rank_softmax_forward(v_r, tqa, v_mask):
    B, V, R, X = v_r.shape
    Q, A, G = tqa.shape[1], tqa.shape[2], tqa.shape[-1]
    RX = R * X
    vr2 = v_r.reshape(B, V, RX)
    # tqa [B, Q, A, R, X, G] -> per-(b, g) GEMM weights [B, G, RX, Q*A]
    w = jnp.transpose(tqa, (0, 5, 3, 4, 1, 2)).reshape(B, G, RX, Q * A)
    out = pl.pallas_call(
        _rank_softmax_kernel(V, Q * A),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, V, RX), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RX, Q * A), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 1), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, V, Q * A), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, V, Q * A), jnp.float32),
    )(vr2, w, v_mask.astype(jnp.float32)[:, :, None])
    return jnp.transpose(out.reshape(B, G, V, Q, A), (0, 2, 3, 4, 1))


@jax.custom_vjp
def fused_rank_softmax(v_r, tqa, v_mask):
    """att [B,V,Q,A,G] = masked softmax over (V,Q,A) of the rank contraction
    ``einsum('birx,bjlrxg->bijlg', v_r, tqa)``, with the GEMM and softmax
    fused in one Pallas program per (batch, glimpse)."""
    return _rank_softmax_forward(v_r, tqa, v_mask)


def _rank_softmax_fwd(v_r, tqa, v_mask):
    att = _rank_softmax_forward(v_r, tqa, v_mask)
    return att, (att, v_r, tqa)


def _rank_softmax_bwd(res, g):
    att, v_r, tqa = res
    # softmax bwd (masked entries have att == 0, so dl == 0 there), then the
    # GEMM transposes — all MXU-shaped einsums
    dot = jnp.sum(g * att, axis=(1, 2, 3), keepdims=True)
    dl = att * (g - dot)                               # [B,V,Q,A,G]
    dv = jnp.einsum("bijlg,bjlrxg->birx", dl, tqa)
    dtqa = jnp.einsum("bijlg,birx->bjlrxg", dl, v_r)
    return dv, dtqa, None


fused_rank_softmax.defvjp(_rank_softmax_fwd, _rank_softmax_bwd)


def trilinear_attention_fused(v_r, q_r, a_r, T, v_mask):
    """Full pallas-backend trilinear attention: XLA for the (tiny-operand)
    q/a/T precontraction, the fused Pallas GEMM+softmax for the V-sized
    rest.  Returns only the attention (no logits materialized in HBM)."""
    from vqatpu.kernels.blockwise import precontract_qa

    tqa = precontract_qa(q_r, a_r, T)
    return fused_rank_softmax(v_r, tqa, v_mask)


# ---------------------------------------------------------------------------
# Pallas: fused weighted trilinear pooling
# ---------------------------------------------------------------------------

def _tri_pool_kernel(Vb, Q, A, D):
    def kernel(vt_ref, qt_ref, at_ref, w_ref, out_ref):
        # vt [1,Vb,D], qt [1,Q,D], at [1,A,D], w [1,A,Vb,Q], out [1,1,D]
        # Grid (B, V//Vb): the V axis streams through in blocks, accumulating
        # into the revisited out block (keeps per-program VMEM O(Vb) — the
        # whole-V variant blew the 16 MB scoped-vmem limit at V=2048).
        # Statically unrolled over the tiny A axis so every op is a clean
        # 2-D dot / elementwise — no in-kernel reshapes (Mosaic miscompiles
        # sublane-misaligned splits like [V*Q, D] -> [V, Q, D]).
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        vt = vt_ref[0]
        qt = qt_ref[0]
        acc = jnp.zeros((1, D), jnp.float32)
        for l in range(A):
            w_l = w_ref[0, l]  # [Vb, Q]
            z_l = jnp.dot(w_l, qt, preferred_element_type=jnp.float32)  # [Vb, D]
            s_l = (vt * z_l).sum(axis=0, keepdims=True)  # [1, D]
            acc = acc + at_ref[0, pl.ds(l, 1)] * s_l
        out_ref[0] = out_ref[0] + acc
    return kernel


@jax.custom_vjp
def trilinear_pool_pallas(vt, qt, at, w):
    return _tri_pool_forward(vt, qt, at, w)


POOL_V_BLOCK = 256


def _tri_pool_forward(vt, qt, at, w):
    B, V, D = vt.shape
    Q = qt.shape[1]
    A = at.shape[1]
    Vb = min(V, POOL_V_BLOCK)
    n_blocks = -(-V // Vb)
    pad = n_blocks * Vb - V
    wt = jnp.transpose(w, (0, 3, 1, 2))  # [B, A, V, Q]
    if pad:
        # zero-padded boxes contribute nothing (their w rows are zero)
        vt = jnp.concatenate(
            [vt, jnp.zeros((B, pad, D), vt.dtype)], axis=1)
        wt = jnp.concatenate(
            [wt, jnp.zeros((B, A, pad, Q), wt.dtype)], axis=2)
    out = pl.pallas_call(
        _tri_pool_kernel(Vb, Q, A, D),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, Vb, D), lambda b, vb: (b, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, D), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, D), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, Vb, Q), lambda b, vb: (b, 0, vb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, vb: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
    )(vt, qt, at, wt)
    return out[:, 0, :]


def _tri_pool_fwd(vt, qt, at, w):
    return trilinear_pool_pallas(vt, qt, at, w), (vt, qt, at, w)


def _tri_pool_bwd(res, g):
    vt, qt, at, w = res
    # out[b,d] = sum_{i,j,l} vt[b,i,d] w[b,i,j,l] qt[b,j,d] at[b,l,d]
    wq = jnp.einsum("bvqa,bqd->bvad", w, qt)
    wqa = jnp.einsum("bvad,bad->bvd", wq, at)
    gvt = wqa * g[:, None, :]
    wv = jnp.einsum("bvqa,bvd->bqad", w, vt)
    wva = jnp.einsum("bqad,bad->bqd", wv, at)
    gqt = wva * g[:, None, :]
    gat = jnp.einsum("bvqa,bvd,bqd->bad", w, vt, qt) * g[:, None, :]
    gw = jnp.einsum("bd,bvd,bqd,bad->bvqa", g, vt, qt, at)
    return gvt, gqt, gat, gw


trilinear_pool_pallas.defvjp(_tri_pool_fwd, _tri_pool_bwd)


def trilinear_pool(vt, qt, at, w, backend: str = "xla"):
    if backend == "pallas":
        return trilinear_pool_pallas(vt, qt, at, w)
    return trilinear_pool_xla(vt, qt, at, w)
