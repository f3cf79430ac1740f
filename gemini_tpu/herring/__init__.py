"""Herring: sumcheck over bilinear modules + pairing-based inner-
product argument (src/herring/, upstream status ⚠️ WIP).

Generalizes the twisted-scalar-product sumcheck from F x F -> F to
bilinear modules M: Lhs x Rhs -> Target (module.rs:11-28), with the
instances FModule (F x F -> F), G1Module (G1 x F -> G1), G2Module,
PModule (G1 x G2 -> GT via pairings) and GtModule (GT x F -> GT).

Group/pairing arithmetic runs host-side over refimpl (the same tier
the reference's verifier-side pairing code occupies); instance sizes
in the IPA are logarithmic-ish in practice.  Kept host-resident to
mirror the upstream module's experimental status — the TPU fast path
applies to Fr-side provers via the main sumcheck module.
"""

from .modules import FModule, G1Module, G2Module, PModule, GtModule
from .sumcheck import ModuleSumcheck, ModuleTimeProver, ModuleWitness
from .ipa import Crs, Vrs, InnerProductProof
from .space import (
    CrsStream, ModuleElasticProver, ModuleSpaceProver, folded_stream,
)

__all__ = [
    "FModule", "G1Module", "G2Module", "PModule", "GtModule",
    "ModuleSumcheck", "ModuleTimeProver", "ModuleWitness",
    "Crs", "Vrs", "InnerProductProof",
    "CrsStream", "ModuleElasticProver", "ModuleSpaceProver",
    "folded_stream",
]
