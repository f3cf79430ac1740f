"""Cross-process trace cache: jax.export-backed jit.

XLA's persistent cache covers *compiles*, but Python tracing/lowering
is redone by every fresh process — for the big field-formula graphs
that costs tens of seconds per shape bucket (PERF.md).  `export_cached`
wraps a jitted function so each (shapes, statics, backend, code
fingerprint) instance is exported ONCE to StableHLO on disk and
deserialized by later processes (the deserialized module's compile
still hits the XLA persistent cache, so a fully warm start pays
neither tracing nor compiling).

Policy mirrors ops/msm.py: enabled on the TPU backend by default
(process-warm tracing is the prover-startup cost there), disabled on
CPU (in-process jit caching suffices for tests, and export +
virtual-multi-device CPU was in the mix for sporadic jaxlib
compilation-cache segfaults) — override with GEMINI_TPU_EXPORT_CACHE
(path | "0" to disable) / GEMINI_TPU_EXPORT_CPU=1.

Deserialized exports are re-jitted once per process: `exp.call`
re-lowers per invocation, a 2x trap (PERF.md).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence

import jax

_MEM: dict = {}
_FP: dict = {}


def _fingerprint(mods: Sequence) -> str:
    """Package-wide source hash.  Traced programs reach transitively
    into ops/curve/fields modules the call sites don't list (ADVICE r4:
    a stale fingerprint silently deserializes old StableHLO on TPU), so
    the fingerprint covers EVERY .py under gemini_tpu/ — any source
    edit invalidates every cached export.  `mods` is kept in the
    signature for call-site documentation but no longer scopes the key.
    """
    fp = _FP.get("pkg")
    if fp is None:
        import gemini_tpu

        pkg_dir = os.path.dirname(gemini_tpu.__file__)
        h = hashlib.sha1()
        for root, dirs, files in os.walk(pkg_dir):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    h.update(open(p, "rb").read())
        fp = h.hexdigest()[:16]
        _FP["pkg"] = fp
    return fp


def _cache_dir():
    d = os.environ.get("GEMINI_TPU_EXPORT_CACHE",
                       "/tmp/gemini_tpu_export_cache")
    return None if d in ("", "0") else d


def _enabled(backend: str) -> bool:
    if _cache_dir() is None:
        return False
    if backend == "tpu":
        return True
    return os.environ.get("GEMINI_TPU_EXPORT_CPU") == "1"


def export_cached(name: str, jitted: Callable, fingerprint_mods: Sequence,
                  *args, statics: tuple = ()):
    """Call `jitted(*args)` through the disk trace cache.

    `jitted` must be a jax.jit-wrapped function of the array args only
    (close over static configuration and fold it into `statics`, which
    becomes part of the cache key/filename).  `fingerprint_mods` are
    the modules whose source shapes the traced program.
    """
    backend = jax.default_backend()
    if not _enabled(backend):
        return jitted(*args)
    shapes = tuple((a.shape, str(a.dtype)) for a in args)
    key = (name, backend, shapes, statics)
    fn = _MEM.get(key)
    if fn is None:
        from jax import export as jexport

        cache_dir = _cache_dir()
        os.makedirs(cache_dir, exist_ok=True)
        h = hashlib.sha1(repr((shapes, statics)).encode()).hexdigest()[:12]
        path = os.path.join(
            cache_dir,
            f"{name}_{_fingerprint(fingerprint_mods)}_{backend}_{h}.bin")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    fn = jax.jit(jexport.deserialize(f.read()).call)
            except Exception:
                fn = None
        if fn is None:
            spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            exp = jexport.export(jitted)(*(spec(a) for a in args))
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
            fn = jitted  # already traced; reuse the live jit
        _MEM[key] = fn
    return fn(*args)
