"""Field-op tape VM: run long straight-line field-arithmetic formulas
as a `lax.scan` over an instruction tape instead of inlining them.

Why: an EC group law inlines ~45 Montgomery field ops; as a flat XLA
graph that is thousands of HLO ops and 1-2 *minutes* of compile per
batch shape (CPU backend), times every distinct shape a scan/tree uses.
The tape executes one (mul | add | sub) step per scan iteration against
a register file, so XLA compiles exactly one Montgomery-multiply body
per (n_regs, n_instrs, batch) signature — ~3 s — and the compiled
kernel is shared by every call site with that signature and cached
persistently.

Runtime cost is unchanged (the same field ops execute; `lax.switch`
runs only the taken branch) plus one dynamic-slice gather/scatter on
the register axis per instruction — negligible against a 24-limb
Montgomery multiply.

Programs are recorded once at import time through `TapeProgram` (an
SSA builder with liveness-based register reuse), then executed with
`run`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fp

OP_MUL, OP_ADD, OP_SUB = 0, 1, 2


class TapeProgram:
    """SSA recorder for a straight-line field formula.

    Usage:
        p = TapeProgram(n_inputs=6)
        x1, y1, z1, x2, y2, z2 = p.inputs
        t = p.mul(x1, x2)
        ...
        p.set_outputs([x3, y3, z3])
        p.finalize()
    """

    def __init__(self, n_inputs: int):
        self.n_inputs = n_inputs
        self.inputs = list(range(n_inputs))
        self._next = n_inputs
        self.instrs: List[tuple] = []  # (op, a_val, b_val, dst_val)
        self.outputs: List[int] = []
        self._phys: np.ndarray | None = None

    def _emit(self, op: int, a: int, b: int) -> int:
        dst = self._next
        self._next += 1
        self.instrs.append((op, a, b, dst))
        return dst

    def mul(self, a: int, b: int) -> int:
        return self._emit(OP_MUL, a, b)

    def sqr(self, a: int) -> int:
        return self._emit(OP_MUL, a, a)

    def add(self, a: int, b: int) -> int:
        return self._emit(OP_ADD, a, b)

    def sub(self, a: int, b: int) -> int:
        return self._emit(OP_SUB, a, b)

    def dbl(self, a: int) -> int:
        return self._emit(OP_ADD, a, a)

    def set_outputs(self, outs: Sequence[int]) -> None:
        self.outputs = list(outs)

    def finalize(self) -> None:
        """Liveness-based linear-scan register allocation (values die at
        their last use; outputs and inputs live to the end — inputs so
        callers may alias them as outputs safely)."""
        n_vals = self._next
        last_use = [0] * n_vals
        for i in range(self.n_inputs):
            last_use[i] = len(self.instrs) + 1
        for v in self.outputs:
            last_use[v] = len(self.instrs) + 1
        for t, (_, a, b, _) in enumerate(self.instrs):
            last_use[a] = max(last_use[a], t)
            last_use[b] = max(last_use[b], t)

        phys = [-1] * n_vals
        free: List[int] = []
        n_regs = self.n_inputs
        for i in range(self.n_inputs):
            phys[i] = i
        rows = []
        for t, (op, a, b, dst) in enumerate(self.instrs):
            # free registers whose value dies strictly before this instr
            for v in range(self.n_inputs, n_vals):
                if phys[v] >= 0 and last_use[v] == t - 1:
                    free.append(phys[v])
                    phys[v] = -2  # dead
            pa, pb = phys[a], phys[b]
            assert pa >= 0 and pb >= 0, f"operand read after free at {t}"
            if free:
                phys[dst] = free.pop()
            else:
                phys[dst] = n_regs
                n_regs += 1
            rows.append((op, pa, pb, phys[dst]))
        self.n_regs = n_regs
        self.tape = np.array(rows, dtype=np.int32)
        self.out_regs = [phys[v] for v in self.outputs]
        assert all(r >= 0 for r in self.out_regs)

    def __len__(self):
        return len(self.instrs)




@partial(jax.jit, static_argnums=(0,))
def _tape_exec(spec, regs, tape):
    """regs: (n_regs, L, *batch) uint32; tape: (n_instr, 4) int32."""

    # On TPU the multiply branch is fully unrolled: one fusible graph,
    # no nested scan — the scan-of-scan form serialized into ~1000
    # sequential micro-steps per instruction and dominated MSM
    # wall-clock.  On CPU (tests) the scan form compiles ~40x faster
    # and runs fine.
    try:
        unroll = jax.default_backend() == "tpu"
    except Exception:
        unroll = False
    mul = fp.mont_mul_unrolled if unroll else fp.mont_mul

    def step(regs, ins):
        ra = regs[ins[1]]
        rb = regs[ins[2]]
        out = jax.lax.switch(
            ins[0],
            [
                lambda x, y: mul(spec, x, y),
                lambda x, y: fp.add(spec, x, y),
                lambda x, y: fp.sub(spec, x, y),
            ],
            ra,
            rb,
        )
        return regs.at[ins[3]].set(out), None

    regs, _ = jax.lax.scan(step, regs, tape)
    return regs


# Max lanes per tape execution: bounds the CIOS scan carry
# ((L+1) * lanes * 4 B) and per-instruction register slices so they
# stay VMEM-resident on TPU — beyond this the scan carry spills to HBM
# and every multiply pays 24 HBM round trips of the accumulator.
TAPE_TILE = 1 << 14


def _run_flat(spec, prog: TapeProgram, flat_inputs):
    L = spec.n_limbs
    n = flat_inputs[0].shape[1]
    regs = jnp.zeros((prog.n_regs, L, n), dtype=jnp.uint32)
    for i, x in enumerate(flat_inputs):
        regs = regs.at[i].set(x)
    regs = _tape_exec(spec, regs, jnp.asarray(prog.tape))
    return [regs[r] for r in prog.out_regs]


def run(spec, prog: TapeProgram, inputs: Sequence[jnp.ndarray]):
    """Execute a finalized program; inputs are (L, *batch) Montgomery
    limb arrays (all the same batch shape).  Returns the output list.

    Batches larger than TAPE_TILE lanes run as a `lax.map` over lane
    tiles (one compiled body, VMEM-friendly working set)."""
    assert len(inputs) == prog.n_inputs
    L = spec.n_limbs
    batch = inputs[0].shape[1:]
    n = 1
    for d in batch:
        n *= d
    if n <= TAPE_TILE:
        flat = [x.reshape(L, n) for x in inputs]
        outs = _run_flat(spec, prog, flat)
        return [o.reshape(L, *batch) for o in outs]

    t = -(-n // TAPE_TILE)
    npad = t * TAPE_TILE
    tiles = []
    for x in inputs:
        f = x.reshape(L, n)
        if npad != n:
            f = jnp.concatenate(
                [f, jnp.zeros((L, npad - n), jnp.uint32)], axis=1
            )
        # (T, L, TILE) — map axis leading
        tiles.append(
            f.reshape(L, t, TAPE_TILE).transpose(1, 0, 2)
        )

    def body(xs):
        return tuple(_run_flat(spec, prog, list(xs)))

    outs = jax.lax.map(body, tuple(tiles))
    result = []
    for o in outs:
        f = o.transpose(1, 0, 2).reshape(L, npad)[:, :n]
        result.append(f.reshape(L, *batch))
    return result
