"""Compute primitives: polynomial helpers, scans, the field-op tape VM,
and the MSM pipeline.

NB: `ops.msm` depends on `curve`, which depends on `ops.tape` — so this
package __init__ must stay import-light.  Import submodules explicitly:

    from gemini_tpu.ops import poly, scan, tape
    from gemini_tpu.ops.msm import msm, msm_mont_scalars
"""

from . import poly, scan, tape  # noqa: F401  (leaf modules, no cycles)
