"""Deterministic release of persisted intermediates.

Operators sometimes persist() a small intermediate that several branches
of the returned plan re-read (e.g. the n-gram candidate-pair set, the
fused missing-rate aggregate). An unbounded persist() pins executor
storage for the life of the session; relying on Spark's ContextCleaner
does not work from PySpark in practice (the JVM-side weak references
never clear while py4j bindings and listener state are alive — verified
empirically: neither persist() nor localCheckpoint() blocks are
reclaimed after the Python wrappers are dropped and both GCs run).

release_on_gc ties the unpersist to the *Python* object lifetime of the
returned result(s) via weakref.finalize — deterministic CPython
refcount semantics, no JVM GC involved. Correctness is unaffected
either way: unpersist only drops the cache, and any still-referenced
derived plan simply recomputes the intermediate on its next action.
"""

from __future__ import annotations

import weakref


def release_on_gc(resource, *results):
    """Arrange for `resource.unpersist()` once every DataFrame in
    `results` has been garbage-collected. The callback closure keeps
    `resource`'s Python wrapper (and thus its py4j binding) alive until
    release. Safe if the SparkSession is already stopped."""
    state = {"remaining": len(results)}

    def _done(state=state, resource=resource):
        state["remaining"] -= 1
        if state["remaining"] <= 0:
            try:
                resource.unpersist()
            except Exception:
                pass  # session gone — nothing left to release

    for r in results:
        weakref.finalize(r, _done)
    return results[0] if len(results) == 1 else results


def tether(result, *intermediates):
    """Pin `intermediates`' Python wrappers to `result`'s lifetime.

    A composed plan that consumes an operator output whose persist is
    release_on_gc-tied to THAT output (e.g.
    ``grm_sketch_y(grm_pairs(...))``) drops the intermediate's Python
    reference the moment the composition returns — firing the
    finalizer and unpersisting BEFORE the composed plan ever executes.
    The cache substitution then silently vanishes from the physical
    plan and every branch recomputes the shared subtree (measured: the
    dose dedup built twice per sketch/projection query). Tethering the
    intermediate to the final result restores the intended lifecycle:
    released when the RESULT is dropped, exactly like the direct-use
    case."""
    existing = getattr(result, "_seqarray_tethered", ())
    result._seqarray_tethered = tuple(existing) + tuple(intermediates)
    return result
