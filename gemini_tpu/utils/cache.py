"""Persistent-compilation-cache hygiene.

jax's persistent cache has two known failure modes in this repo's
environment (CLAUDE.md):

  * two processes compiling into one cache dir can SEGFAULT in
    `put_executable_and_time`;
  * a run killed mid-write (e.g. under `timeout`) can leave a POISON
    entry that deterministically segfaults every later reader in
    `get_executable_and_time`.

`setup_compilation_cache` wraps `jax.config.update("jax_compilation_
cache_dir", ...)` with a sentinel protocol that turns both into
non-events:

  * every process drops `<dir>/.inuse.<pid>` on entry and removes it at
    clean interpreter exit (atexit);
  * on entry, a sentinel whose pid is DEAD means a previous writer
    exited uncleanly — the whole dir is quarantined (renamed aside and
    deleted best-effort) and rebuilt fresh;
  * a sentinel whose pid is ALIVE means a concurrent writer — this
    process transparently switches to a private `<dir>.<pid>` dir.

Cheap insurance: the cache only ever saves compile time, so the worst
case of a false quarantine is a cold rebuild.
"""

from __future__ import annotations

import atexit
import os
import shutil
import time


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except Exception:
        return True
    return True


def _sentinels(d: str):
    try:
        names = os.listdir(d)
    except OSError:
        return []
    out = []
    for name in names:
        if name.startswith(".inuse."):
            try:
                out.append((name, int(name.split(".")[-1])))
            except ValueError:
                out.append((name, -1))
    return out


def _quarantine(d: str) -> None:
    dest = f"{d}.quarantined.{int(time.time())}.{os.getpid()}"
    try:
        os.rename(d, dest)
    except OSError:
        return  # someone else rotated it first; fine
    shutil.rmtree(dest, ignore_errors=True)


def setup_compilation_cache(d: str) -> str:
    """Point jax's persistent compilation cache at `d` (or a private
    sibling when `d` is busy), with unclean-exit quarantine.  Returns
    the directory actually used.  Call BEFORE the first compilation."""
    import jax

    os.makedirs(d, exist_ok=True)
    stale, busy = [], False
    for name, pid in _sentinels(d):
        if pid != os.getpid() and _alive(pid):
            busy = True
        else:
            stale.append(name)
    if busy:
        # A live concurrent writer owns `d` — leave it alone (even if
        # stale sentinels also exist) and use a private sibling.
        d = f"{d}.{os.getpid()}"
    elif stale:
        # A previous writer died unclean — any entry may be poisoned.
        _quarantine(d)
    os.makedirs(d, exist_ok=True)

    sentinel = os.path.join(d, f".inuse.{os.getpid()}")
    with open(sentinel, "w") as f:
        f.write(str(os.getpid()))

    def _clean():
        try:
            os.unlink(sentinel)
        except OSError:
            pass

    atexit.register(_clean)

    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return d
