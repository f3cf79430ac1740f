"""Multi-scalar multiplication (Pippenger) as a TPU-native pipeline.

The reference's MSM is bucket-scatter Pippenger on CPU threads
(algorithm documented at /root/reference/src/kzg/msm/variable_base.rs,
superseded upstream; SURVEY.md §3.5).  Data-dependent scatter-adds
serialize badly on vector hardware, so bucket accumulation uses the
threshold-suffix identity instead:

    sum_i d_i P_i = sum_{k=1}^{2^c-1} ( sum_{i: d_i >= k} P_i )

With points sorted by digit, each inner sum is one entry of the
suffix-sum array, so per window the bucket phase is one plain-add
suffix scan over sorted points (~2N complete adds) + a boundary
gather + a tree reduction — no segment flags, no scatter.

Digits are SIGNED (magnitude ≤ 2^(c-1), negative digits negate the
point during the sort — one conditional y -> p-y pass), which cuts
the window count for the same bucket cost (c=17: 15 windows vs 16).

Orchestration (see ops/ec_scan.py for the compile-cost rationale):
windows are processed in chunks chosen by `plan_window` as a batch
axis; on TPU the suffix scan runs fused Pallas RCB kernels (level 0
uses the cheaper z∈{0,1} specialization, curve/pallas_g1.py); the
final Horner combine

    result = sum_w 2^(c*w) T_w

runs on the HOST over the O(W) window totals.

Scalars enter in canonical (non-Montgomery) limb form, REDUCED (< R —
the signed recode needs top-window carry headroom); points as affine
with infinity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp
from ..fields.fp import FQ, FR
from ..curve import g1
from ..curve.g1 import APoint, JPoint
from . import ec_scan
from . import scan as scan_util

LIMB_BITS = fp.LIMB_BITS

from ..params import R as _R_FR


def plan_window(n: int, n_bits: int = 255, max_scalar: int | None = None):
    """Pick (window size c, windows-per-chunk Wc) minimizing the
    pipeline's add count with SIGNED digits: W = ceil(n_bits/c) windows
    of magnitude ≤ 2^(c-1) (negative digits negate the point — free in
    the sort phase), so the bucket reduce is half the unsigned size and
    the top window must absorb the recode carry (checked against R).

    Cost per window (ec_scan.prefix_sums_at with m = 2^(c-1) boundary
    positions): n reduce-chain adds + 2m stop-level scan + m walk-down
    fix-ups per level + m bucket tree-reduce.  Chunk padding is real
    work (padded windows still scan), so the plan prefers Wc | W.
    Memory: the pipeline holds ~6 coordinate arrays of (L, Wc, n) —
    Wc is capped so that stays a few GB at n = 2^20.  Computed per
    padded bucket size: one compiled pipeline per bucket.
    """
    import math
    import os

    if max_scalar is None:
        max_scalar = _R_FR
    if n <= 32:
        return 3, 4
    best = None
    wc_env = os.environ.get("GEMINI_TPU_WC")
    for c in range(4, 21):
        w = -(-n_bits // c)
        if (max_scalar >> (c * (w - 1))) + 1 > (1 << (c - 1)):
            continue  # top window could overflow under recode carry
        m = 1 << (c - 1)
        levels = max(0, int(math.log2(max(n // max(m, 1), 1))))
        per_window = n + 2 * m + m * levels + m
        for wc in (1, 2, 3, 4, 5):
            if wc > 1 and wc * n > 5 << 20:
                continue
            chunks = -(-w // wc)
            cost = chunks * wc * per_window
            # On cost ties prefer the SMALLEST chunk: measured at 2^20
            # (round 3), Wc=4 was 1.6x SLOWER than Wc=1 (246K vs 397K
            # pts/s) — the larger working set (0.4 GB per coordinate
            # array plus the walk-down level stack) evicts the scan's
            # reuse, while per-dispatch overhead is already amortized
            # by async pipelining.
            if best is None or cost < best[0]:
                best = (cost, c, wc)
    if best is None:  # tiny n with huge windows filtered out
        return 8, 4
    if wc_env:
        return best[1], int(wc_env)
    return best[1], best[2]


def default_window(n: int, n_bits: int = 255) -> int:
    return plan_window(n, n_bits)[0]


def extract_digits(scalars: jnp.ndarray, c: int, n_bits: int = 255):
    """(L, N) canonical limbs -> (W, N) uint32 window digits, W windows
    of c bits, little-endian windows."""
    L = scalars.shape[0]
    n_windows = -(-n_bits // c)
    digits = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(n_windows):
        bit0 = w * c
        limb, off = divmod(bit0, LIMB_BITS)
        d = scalars[limb] >> jnp.uint32(off)
        rem = LIMB_BITS - off  # bits obtained from this limb
        if rem < c and limb + 1 < L:
            d = d | (scalars[limb + 1] << jnp.uint32(rem))
        digits.append(d & mask)
    return jnp.stack(digits, axis=0)


@partial(jax.jit, static_argnums=(1, 2))
def extract_signed_digits(scalars, c: int, n_bits: int = 255):
    """(L, N) canonical limbs (< R) -> signed window digits:
    (mags (W, N) uint32 in [0, 2^(c-1)], negs (W, N) bool).

    Standard signed recode: d' = raw + carry; if d' > 2^(c-1) emit
    d' - 2^c (negative) and carry 1.  Negative digits cost nothing —
    the point is negated (y -> p - y) during the sort phase.  The top
    window absorbs the final carry without overflow because scalars
    are < R (checked statically by plan_window)."""
    raw = extract_digits(scalars, c, n_bits)
    w_count = raw.shape[0]
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    mags, negs = [], []
    carry = jnp.zeros_like(raw[0])
    for w in range(w_count):
        d = raw[w] + carry
        neg = d > half
        mags.append(jnp.where(neg, full - d, d))
        negs.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(mags, axis=0), jnp.stack(negs, axis=0)


def _horner_host(totals_jac, c: int) -> JPoint:
    """result = sum_w 2^(c*w) * T_w, combined on HOST.

    The window totals are O(W) points — reading them back costs ~3 KB
    while the device Horner alternative (a fori_loop of ~255 tape-VM
    double+adds) was the single worst compile in the whole MSM (tens of
    minutes cold on TPU, per distinct W).  Host cost: c*(W-1) affine
    doublings ≈ sub-millisecond, overlapped with nothing — the rest of
    the pipeline has already drained by the time totals are real."""
    from ..hostcurve import g1_add, g1_double

    pts = g1.decode_jacobian(JPoint(*totals_jac))
    acc = None
    for w in reversed(range(len(pts))):
        if acc is not None:
            for _ in range(c):
                acc = g1_double(acc)
        acc = g1_add(acc, pts[w])
    one = FQ.ones_mont((1,))
    if acc is None:
        return JPoint(FQ.zeros((1,)), one, FQ.zeros((1,)))
    ap = g1.encode_affine([acc])
    return JPoint(jnp.asarray(ap.x), jnp.asarray(ap.y), one)


def _pack_xy(px, py):
    """(24, N) x and y coordinate planes -> ONE (24, N) uint32 array:
    rows 0..11 = x limbs j | (x limbs j+12 << 16), rows 12..23 = y.
    Lane gathers on TPU cost ~40 ns PER INDEX independent of the row
    count up to ~24 rows (benches/glueprobe.py), so one packed gather
    fetches both coordinates for the price of one."""
    return jnp.concatenate(
        [px[:12] | (px[12:] << jnp.uint32(16)),
         py[:12] | (py[12:] << jnp.uint32(16))],
        axis=0,
    )


def _unpack_half(g12):
    """(12, ...) packed rows -> (24, ...) 16-bit rows ([lo | hi] halves
    by construction — no sublane interleave)."""
    return jnp.concatenate([g12 & jnp.uint32(0xFFFF), g12 >> jnp.uint32(16)],
                           axis=0)


@partial(jax.jit, static_argnums=(4,))
def _sort_gather_proj(pp, pinf, mags, negs, rev_bits: int = 0):
    """Sort each window's points by digit magnitude, emitting FLIPPED
    (descending) (x, y, mask) for the RCB padd01 level-0 kernel plus
    the ASCENDING sorted digits (for the boundary positions).

    Per-index costs dominate this phase (benches/glueprobe.py), so the
    whole thing is ONE key sort + ONE packed coordinate gather:
      * the neg/inf flags ride in the sort key's low bits (any order
        within a digit group is valid — the scan is a sum);
      * the 100 MB coordinate flip is replaced by flipping the 4 MB
        order array before the gather;
      * dead lanes (infinity or digit 0) become the identity
        (0 : y : 0), y nonzero; negative digits negate y.

    `rev_bits`: emit (x, y, mask) in the partial bit-reversed lane
    layout (ec_scan.partial_bitrev_last applied to the 4 MB order/key
    arrays — one cheap transpose, never the coordinates) so the scan
    phase's level splits are contiguous halves (the stride-2 cliff
    fix, benches/scancliff.py).  `sd` stays positional/ascending."""
    Wc, n = mags.shape
    key = ((mags << jnp.uint32(2))
           | (negs.astype(jnp.uint32) << jnp.uint32(1))
           | jnp.broadcast_to(pinf, (Wc, n)).astype(jnp.uint32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (Wc, n))
    # is_stable=False: any order within a digit group is valid (the
    # scan is a sum) and the unstable network is ~10% faster (PERF.md).
    skey, order = jax.lax.sort((key, iota), num_keys=1, is_stable=False)
    order_f = order[:, ::-1]
    skey_f = skey[:, ::-1]
    if rev_bits:
        order_f = ec_scan.partial_bitrev_last(order_f, rev_bits)
        skey_f = ec_scan.partial_bitrev_last(skey_f, rev_bits)
    g = pp[:, order_f]  # (24, Wc, n): packed x | y, descending digits
    gx = _unpack_half(g[:12])
    gy = _unpack_half(g[12:])
    sd = skey >> jnp.uint32(2)  # ascending magnitudes
    sneg = (skey_f >> jnp.uint32(1)) & jnp.uint32(1)
    ginf = (skey_f & jnp.uint32(1)).astype(bool)
    one = FQ.ones_mont((Wc, n))
    dead = jnp.logical_or(ginf, skey_f >> jnp.uint32(2) == 0)
    x = fp.select(dead, FQ.zeros((Wc, n)), gx)
    y = fp.select(sneg.astype(bool), fp.neg(FQ, gy), gy)
    y = fp.select(ginf, one, y)
    mask = jnp.logical_not(dead)
    return x, y, mask, sd


@jax.jit
def _proj_to_jacobian(x, y, z):
    """(X : Y : Z) -> Jacobian (XZ, YZ^2, Z) (agree whenever Z != 0;
    both encode infinity as Z == 0).

    Inputs arrive RELAXED (< 2p) from the Pallas padd pipeline; the
    mont_muls canonicalize x/y products and the explicit add-zero
    canonicalizes z (O(W) lanes — negligible)."""
    xz = fp.mont_mul(FQ, x, z)
    z2 = fp.mont_mul(FQ, z, z)
    yz2 = fp.mont_mul(FQ, y, z2)
    z_canon = fp.add(FQ, z, jnp.zeros_like(z))
    return xz, yz2, z_canon


def _use_proj() -> bool:
    """Fused Pallas projective pipeline: default on TPU, off elsewhere
    (the Mosaic kernels only build for TPU)."""
    import os

    if os.environ.get("GEMINI_TPU_PROJ") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _boundary_positions(sd, c: int):
    """Flipped-prefix positions of the signed-digit bucket boundaries:
    suffix_{mag >= k} in sorted order == prefix up to n-1-searchsorted(k)
    in FLIPPED order, for k = 1..2^(c-1); -1 = empty (identity).

    searchsorted_left(sd, k) = #elements < k is computed via ONE
    scatter-max + running max instead of 2^(c-1) vmapped binary
    searches (each search round is a per-index gather; glueprobe.py):
    t[v] = 1 + last index of value v, cummax(t)[v] = #elements <= v
    (sd is sorted), and #< k = cummax(t)[k-1]."""
    import os

    Wc, n = sd.shape
    m = 1 << (c - 1)
    mode = os.environ.get("GEMINI_TPU_BOUND", "hist")  # A/B knob
    if mode == "search":
        ks = jnp.arange(1, m + 1, dtype=jnp.uint32)
        b = jax.vmap(lambda row: jnp.searchsorted(row, ks, side="left"))(sd)
        return (n - 1) - b.astype(jnp.int32)
    if mode == "scatter":
        iota = jnp.arange(1, n + 1, dtype=jnp.uint32)

        def one(row):
            t = jnp.zeros((m + 1,), jnp.uint32).at[row].max(
                iota, indices_are_sorted=True, mode="drop")
            return jax.lax.cummax(t)[:m]  # b[k-1] = #elements < k

        b = jax.vmap(one)(sd)
        return (n - 1) - b.astype(jnp.int32)  # (Wc, 2^(c-1)) in [-1, n-1]
    # Default: histogram via MXU.  Counting beats searching/scattering
    # because per-index ops cost ~40 ns on TPU while one-hot matmuls
    # ride the MXU: count[hi, lo] = sum_i [v_i >> LB == hi][v_i & LM ==
    # lo] is an (HI, T) x (T, 128) bf16 matmul per value chunk (one-hot
    # entries are exact in bf16; counts <= n < 2^24 are exact in the
    # f32 accumulator).  b[k] = #elements < k = exclusive-cumsum of the
    # flattened histogram; works on UNSORTED values too (sd is handy).
    LB, LN = 7, 128  # low bits / bins
    hi_bins = (m >> LB) + 1  # values reach m inclusive
    chunk = min(n, 1 << 13)
    n_pad = -(-n // chunk) * chunk
    v = sd
    if n_pad != n:  # pad with an out-of-range hi bin? clamp to m instead
        v = jnp.concatenate(
            [v, jnp.full((Wc, n_pad - n), m, jnp.uint32)], axis=1)
    hi = (v >> LB).astype(jnp.int32)
    lo = (v & (LN - 1)).astype(jnp.int32)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hi_bins), 2)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LN), 2)
    counts = jnp.zeros((Wc, hi_bins, LN), jnp.float32)
    for s in range(0, n_pad, chunk):
        h1 = (hi[:, s:s + chunk, None] == hi_iota).astype(jnp.bfloat16)
        l1 = (lo[:, s:s + chunk, None] == lo_iota).astype(jnp.bfloat16)
        counts = counts + jax.lax.dot_general(
            h1, l1, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    flat = counts.reshape(Wc, hi_bins * LN).astype(jnp.int32)
    if n_pad != n:  # remove the padding's contribution to bin m
        flat = flat - jnp.zeros_like(flat).at[:, m].set(n_pad - n)
    b = jnp.cumsum(flat, axis=1)[:, :m]  # b[k-1] = #elements < k
    return (n - 1) - b


def _tape_padd01(a, b):
    """z∈{0,1} level-0 combiner for the CPU/tape path: lift masks to
    Jacobian z and use the shared tiled add (z∈{0,1} is valid in both
    Jacobian and projective coordinates, so the sort/walk-down logic
    is shared across backends and covered by the CPU tests)."""
    return ec_scan.add_points(ec_scan._lift01(*a), ec_scan._lift01(*b))


@partial(jax.jit, static_argnums=(4, 5))
def _window_chunk(pp, pinf, mags, negs, c: int, use_proj: bool):
    """One window-chunk of the Pippenger pipeline as a SINGLE jitted
    computation: sort-by-magnitude (negating negative digits), then
    positional prefix sums at the 2^(c-1) bucket boundaries
    (ec_scan.prefix_sums_at — ~35% fewer adds than a full suffix
    scan), then the bucket tree-reduce.  Fusing the whole chunk keeps
    the glue ops out of the per-op dispatch path — at 2^20 the unfused
    pipeline was ~10^3 tunnel dispatches per MSM and dispatch-bound,
    not compute-bound.  `pp` is the packed coordinate array
    (_pack_xy)."""
    if use_proj:
        combiner = ec_scan.pallas_padd_points
        combiner01 = ec_scan.pallas_padd01_points
    else:
        combiner = ec_scan.add_points
        combiner01 = _tape_padd01
    n = mags.shape[1]
    rb = ec_scan.bitrev_levels(n, 1 << (c - 1))
    fx, fy, fm, sd = _sort_gather_proj(pp, pinf, mags, negs, rb)
    pos = _boundary_positions(sd, c)
    bx, by, bz = ec_scan.prefix_sums_at(
        fx, fy, fm, pos, combiner=combiner, combiner01=combiner01,
        rev_bits=rb,
    )
    x, y, z = ec_scan.tree_reduce((bx, by, bz), combiner=combiner)
    return x[..., 0], y[..., 0], z[..., 0]


# ---------------------------------------------------------------------------
# jax.export trace cache: Python tracing of the fused window-chunk
# pipeline costs ~60 s per pow-4 size bucket and — unlike XLA compiles —
# is NOT covered by the persistent compilation cache (PERF.md).  Each
# (shapes, plan, backend, code-fingerprint) chunk is exported once to
# disk as StableHLO and deserialized on later runs (compilation of the
# deserialized module still hits the XLA persistent cache).
# ---------------------------------------------------------------------------

_EXPORT_MEM: dict = {}
_CODE_FP: str | None = None


def _code_fingerprint() -> str:
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib
        import os

        from ..curve import pallas_g1 as _pg
        from . import glv as _glv

        h = hashlib.sha1()
        for mod in (_pg, ec_scan, _glv):
            h.update(open(mod.__file__, "rb").read())
        h.update(open(__file__, "rb").read())
        # Kernel-shaping env knobs change the traced program without
        # changing any file hash.
        for knob in ("GEMINI_TPU_MM2", "GEMINI_TPU_MXU", "GEMINI_TPU_PTILE",
                     "GEMINI_TPU_BOUND", "GEMINI_TPU_GLV"):
            h.update(f"{knob}={os.environ.get(knob, '')};".encode())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def _export_cache_dir():
    import os

    d = os.environ.get("GEMINI_TPU_EXPORT_CACHE",
                       "/tmp/gemini_tpu_export_cache")
    return None if d in ("", "0") else d


def _window_chunk_call(pp, pinf, mags, negs, c: int, use_proj: bool):
    cache_dir = _export_cache_dir()
    backend = jax.default_backend()
    # TPU-only by default: process-warm tracing is the prover-startup
    # cost there; on the CPU backend the in-process jit cache suffices,
    # and export+virtual-multi-device CPU was in the mix for sporadic
    # jaxlib compilation-cache segfaults (CLAUDE.md).
    if cache_dir is None or backend != "tpu":
        return _window_chunk(pp, pinf, mags, negs, c, use_proj)
    key = (pp.shape, mags.shape, c, use_proj, backend)
    fn = _EXPORT_MEM.get(key)
    if fn is None:
        import os

        from jax import export as jexport

        os.makedirs(cache_dir, exist_ok=True)
        name = (f"wc_{_code_fingerprint()}_{backend}_{pp.shape[1]}_"
                f"{mags.shape[0]}x{mags.shape[1]}_{c}_{int(use_proj)}.bin")
        path = os.path.join(cache_dir, name)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    # exp.call re-lowers per invocation; jit it once so
                    # the 15 chunk calls per MSM reuse one executable.
                    fn = jax.jit(jexport.deserialize(f.read()).call)
            except Exception:
                fn = None
        if fn is None:
            wrapped = jax.jit(
                lambda a, b, d, e: _window_chunk(a, b, d, e, c, use_proj)
            )
            spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            exp = jexport.export(wrapped)(
                spec(pp), spec(pinf), spec(mags), spec(negs)
            )
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
            fn = wrapped  # already traced; reuse the live jit
        _EXPORT_MEM[key] = fn
    return fn(pp, pinf, mags, negs)


def _use_glv(n_bits: int) -> bool:
    """GLV halves the window count for full-size Fr scalars; skip it
    for short scalars (the split only pays when windows halve).

    Default OFF: the 2^21-lane window chunks the split produces
    currently run ~2x slower per add than 2^20-lane chunks on the v5e
    (same pathology as Wc>1 batching — see PERF.md), which eats the
    halved-window win at the 2^20 benchmark size.  Flip with
    GEMINI_TPU_GLV=1; correctness is tested on every run."""
    import os

    return os.environ.get("GEMINI_TPU_GLV", "0") == "1" and n_bits > 160


def _glv_plan(n_lanes: int):
    from . import glv as glv_mod

    return plan_window(n_lanes, glv_mod.GLV_BITS,
                       max_scalar=glv_mod.COMPONENT_BOUND)


@partial(jax.jit, static_argnums=(4,))
def _glv_window_digits(k1m, k1n, k2m, k2n, c: int):
    """GLV component limbs -> per-window (mags, negs) over the DOUBLED
    lane axis [P lanes | phi(P) lanes]; component signs fold into the
    digit negation flags the sort consumes."""
    from . import glv as glv_mod

    m1, g1 = extract_signed_digits(k1m, c, glv_mod.GLV_BITS)
    m2, g2 = extract_signed_digits(k2m, c, glv_mod.GLV_BITS)
    g1 = jnp.logical_xor(g1, k1n[None, :])
    g2 = jnp.logical_xor(g2, k2n[None, :])
    return (jnp.concatenate([m1, m2], axis=1),
            jnp.concatenate([g1, g2], axis=1))


def _glv_double_points(points: APoint):
    """[P | phi(P)] along the lane axis: phi scales x by beta (one
    constant Montgomery multiply), y and infinity flags are shared."""
    from . import glv as glv_mod

    return APoint(
        jnp.concatenate([points.x, glv_mod.endo_x(points.x)], axis=1),
        jnp.concatenate([points.y, points.y], axis=1),
        jnp.concatenate([points.inf, points.inf]),
    )


def _pad_points_scalars(points: APoint, scalars, npad: int):
    n = points.x.shape[1]
    if npad == n:
        return points, scalars
    pad = npad - n
    points = APoint(
        jnp.concatenate(
            [points.x, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
        jnp.concatenate(
            [points.y, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
        jnp.concatenate([points.inf, jnp.ones((pad,), bool)]),
    )
    scalars = jnp.concatenate(
        [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)], axis=1)
    return points, scalars


def _run_chunks(pp, pinf, mags, negs, c: int, window_chunk: int,
                use_proj: bool):
    """Dispatch the window-chunk pipeline over all windows; returns
    (x, y, z) totals of shape (L, W) (projective when use_proj)."""
    W = mags.shape[0]
    tx, ty, tz = [], [], []
    for w0 in range(0, W, window_chunk):
        mchunk = mags[w0: w0 + window_chunk]
        nchunk = negs[w0: w0 + window_chunk]
        if mchunk.shape[0] < window_chunk:  # keep one compiled shape
            fill = jnp.zeros(
                (window_chunk - mchunk.shape[0], mchunk.shape[1]), jnp.uint32)
            mchunk = jnp.concatenate([mchunk, fill], axis=0)
            nchunk = jnp.concatenate([nchunk, fill.astype(bool)], axis=0)
        x, y, z = _window_chunk_call(pp, pinf, mchunk, nchunk, c, use_proj)
        tx.append(x)
        ty.append(y)
        tz.append(z)
    return (
        jnp.concatenate(tx, axis=1)[:, :W],
        jnp.concatenate(ty, axis=1)[:, :W],
        jnp.concatenate(tz, axis=1)[:, :W],
    )


def _msm_glv(points: APoint, scalars: jnp.ndarray,
             c: int | None = None) -> JPoint:
    """MSM via GLV split: 2N points (P, phi(P)) x 8 sixteen-bit windows
    instead of N x 16 — the reduce chain is unchanged but sorts, bucket
    overheads and per-chunk costs halve."""
    from . import glv as glv_mod

    n = points.x.shape[1]
    npad = scan_util.bucket4(n, floor=256)
    points, scalars = _pad_points_scalars(points, scalars, npad)
    wc_plan = _glv_plan(2 * npad)
    window_chunk = wc_plan[1]
    if c is None:
        c = wc_plan[0]
    k1m, k1n, k2m, k2n = glv_mod.decompose(scalars)
    mags, negs = _glv_window_digits(k1m, k1n, k2m, k2n, c)
    dbl = _glv_double_points(points)
    use_proj = _use_proj()
    pp = _pack_xy(dbl.x, dbl.y)
    totals = _run_chunks(pp, dbl.inf, mags, negs, c, window_chunk, use_proj)
    if use_proj:
        totals = _proj_to_jacobian(*totals)
    return _horner_host(totals, c)


def _host_msm_max() -> int:
    """CPU-backend-only small-n cutoff below which MSMs run on the
    host (refimpl Pippenger).  Compiling the fused window-chunk
    pipeline costs minutes per shape bucket on the XLA CPU backend —
    a tax every fresh environment (CI, the driver, a new contributor)
    pays for MSMs that take well under a second in Python (VERDICT r3
    weak 5).  The TPU backend never falls back.  Kernel-correctness
    tests force the device path with GEMINI_TPU_HOST_MSM_MAX=0."""
    import os

    v = os.environ.get("GEMINI_TPU_HOST_MSM_MAX")
    if v is not None:
        return int(v)
    return 4096 if jax.default_backend() == "cpu" else 0


def _msm_host(points: APoint, scalars: jnp.ndarray) -> JPoint:
    from ..hostcurve import g1_msm_pippenger

    pts = g1.decode_affine(points)
    ks = FR.decode(scalars, mont=False)
    acc = g1_msm_pippenger(pts, ks)
    one = FQ.ones_mont((1,))
    if acc is None:
        return JPoint(FQ.zeros((1,)), one, FQ.zeros((1,)))
    ap = g1.encode_affine([acc])
    return JPoint(jnp.asarray(ap.x), jnp.asarray(ap.y), one)


def msm(points: APoint, scalars: jnp.ndarray, c: int | None = None,
        n_bits: int = 255, glv: bool | None = None) -> JPoint:
    """MSM over G1: sum_i scalars[i] * points[i].

    points: APoint batch (N,); scalars: (FR_LIMBS, N) canonical
    (non-Montgomery) limbs, each < R (the signed-digit recode relies
    on the top window having carry headroom — every protocol scalar is
    a reduced Fr element).  Returns a JPoint with batch shape (1,).
    """
    n = points.x.shape[1]
    if n <= _host_msm_max():
        return _msm_host(points, scalars)
    if glv is None:
        glv = _use_glv(n_bits)
    if glv:
        return _msm_glv(points, scalars, c)
    # Pad to a power-of-4 shape bucket with (infinity, 0) pairs — a
    # mathematical no-op that keeps every scan level at a power-of-two
    # shape AND collapses the distinct compiled pipelines across all
    # commit sizes in a proof to O(log4 N) (PERF.md roadmap 6).  The
    # window plan is derived from the bucket so each bucket compiles
    # exactly one digit/horner pipeline.
    npad = scan_util.bucket4(n, floor=256)
    wc_plan = plan_window(npad, n_bits)
    window_chunk = wc_plan[1]
    if c is None:
        c = wc_plan[0]
    points, scalars = _pad_points_scalars(points, scalars, npad)
    mags, negs = extract_signed_digits(scalars, c, n_bits)
    use_proj = _use_proj()
    pp = _pack_xy(points.x, points.y)
    totals = _run_chunks(pp, points.inf, mags, negs, c, window_chunk,
                         use_proj)
    if use_proj:
        totals = _proj_to_jacobian(*totals)
    return _horner_host(totals, c)


def msm_mont_scalars(points: APoint, scalars_mont: jnp.ndarray,
                     c: int | None = None, devices=None) -> JPoint:
    """MSM taking Montgomery-form Fr scalars (the prover's native form).
    With `devices` (2+), partials run data-parallel across the mesh
    via shard_map (parallel/msm.py)."""
    sc = fp.from_mont(FR, scalars_mont)
    if devices is not None and len(devices) > 1:
        from ..parallel.msm import msm_multichip

        return msm_multichip(points, sc, devices=devices, c=c)
    return msm(points, sc, c)


def msm_batch(points: APoint, scalars_sets, c: int | None = None,
              n_bits: int = 255, glv: bool | None = None):
    """Many MSMs over PREFIXES of the same base array, as one pipeline.

    scalars_sets: list of (FR_LIMBS, n_i) canonical scalar arrays; set i
    is multiplied against points[:n_i].  All sets are zero-padded to a
    common pow-4 bucket (a zero scalar's windows are all dead lanes)
    and every set's windows are STACKED on the window-chunk axis, so S
    small MSMs cost ceil(S*W / Wc) invocations of the SAME compiled
    chunk pipeline a single MSM uses — the per-MSM startup (tracing,
    dispatch chains) that dominated the fold-tree batch_commit
    (S = log n commitments of halving sizes) is paid once.

    Returns a list of JPoint results, one per scalar set.
    """
    sets = list(scalars_sets)
    if not sets:
        return []
    nmax = max(s.shape[1] for s in sets)
    navail = points.x.shape[1]
    assert nmax <= navail, f"scalar length {nmax} exceeds base count {navail}"
    if nmax <= _host_msm_max():
        return [
            _msm_host(
                APoint(points.x[:, :s.shape[1]], points.y[:, :s.shape[1]],
                       points.inf[:s.shape[1]]), s)
            for s in sets
        ]
    npad = scan_util.bucket4(max(nmax, 1), floor=256)
    if navail >= npad:
        points = APoint(points.x[:, :npad], points.y[:, :npad],
                        points.inf[:npad])
    else:
        pad = npad - navail
        points = APoint(
            jnp.concatenate(
                [points.x, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
            jnp.concatenate(
                [points.y, jnp.zeros((FQ.n_limbs, pad), jnp.uint32)], axis=1),
            jnp.concatenate([points.inf, jnp.ones((pad,), bool)]),
        )
    if glv is None:
        glv = _use_glv(n_bits)
    if glv:
        from . import glv as glv_mod

        wc_plan = _glv_plan(2 * npad)
    else:
        wc_plan = plan_window(npad, n_bits)
    window_chunk = wc_plan[1]
    if c is None:
        c = wc_plan[0]
    mags_l, negs_l = [], []
    for s in sets:
        if s.shape[1] < npad:
            s = jnp.concatenate(
                [s, jnp.zeros((s.shape[0], npad - s.shape[1]), jnp.uint32)],
                axis=1)
        if glv:
            k1m, k1n, k2m, k2n = glv_mod.decompose(s)
            m, g = _glv_window_digits(k1m, k1n, k2m, k2n, c)
        else:
            m, g = extract_signed_digits(s, c, n_bits)
        mags_l.append(m)
        negs_l.append(g)
    W = mags_l[0].shape[0]
    mags = jnp.concatenate(mags_l, axis=0)  # (S*W, lanes)
    negs = jnp.concatenate(negs_l, axis=0)
    if glv:
        points = _glv_double_points(points)
    use_proj = _use_proj()
    pp = _pack_xy(points.x, points.y)
    totals = _run_chunks(pp, points.inf, mags, negs, c, window_chunk,
                         use_proj)
    if use_proj:
        totals = _proj_to_jacobian(*totals)
    # ONE readback for all sets (each _horner_host np.asarray would be
    # a separate ~9 ms tunnel round trip).
    tot_np = jax.device_get(list(totals))
    return [
        _horner_host(tuple(t[:, i * W:(i + 1) * W] for t in tot_np), c)
        for i in range(len(sets))
    ]
