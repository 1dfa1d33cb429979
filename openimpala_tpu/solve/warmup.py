"""Solver warm-up: overlap program compile/load with host-side work.

Through the tunnelled TPU runtime, bringing a big solve online costs real
wall-clock before the first iteration runs: the Galerkin hierarchy
construction programs, the fused chunked-CG program (~4-5 s to
compile/deserialize + upload at 512^3), and the float64 outer-residual
program.  All of that depends only on SHAPES, dtypes, and static solver
options — not on the voxel data.  Meanwhile the percolation flood fill
(props/tortuosity.py step 2) is a pure host computation whose ctypes call
releases the GIL.

``start(...)`` launches a daemon thread that builds a dummy system of the
final solve shape (all-active mask — identical shapes and hierarchy depth,
identical compile keys) and executes one chunk of the production CG program
plus one outer-residual evaluation, priming every jit cache the real solve
will hit.  ``join()`` must be called before the real solve so the two never
compile the same program concurrently.

The reference has no counterpart (Hypre setup happens inline after the MPI
flood fill, ``TortuosityHypre.cpp:208-649``); this is tunnel-latency
engineering, correctness-neutral and best-effort — any exception in the
thread is swallowed and the real solve simply compiles on demand.
"""

from __future__ import annotations

import threading


def _norm_extra_dirs(extra_dirs):
    """Normalize extra_dirs entries to ``(direction, hi_plane)`` pairs
    (bare ints mean hi_plane=None — the non-padded-mesh common case)."""
    return tuple(e if isinstance(e, tuple) else (e, None)
                 for e in extra_dirs)


def _warm(shape, direction, vlo, vhi, dx, storage_name, hi_plane, mesh,
          precond, precond_opts, method, inner_dtype, outer_dtype, eps,
          problem="flow", device_percolation=False, extra_dirs=(),
          fill_events=None, build_events=None, main_ready=None):
    import jax
    import jax.numpy as jnp

    from ..props.tortuosity import _build_system
    from .refine import make_precond, _outer_residual

    def _mark_fill(d):
        if fill_events is not None and d in fill_events:
            fill_events[d].set()

    def _mark_build(d):
        if build_events is not None and d in build_events:
            build_events[d].set()

    def _prime_fill(d):
        from ..ops.packfill import percolation_oneshot_packed

        ok = jax.ShapeDtypeStruct(tuple(shape), jnp.bool_)
        percolation_oneshot_packed.lower(ok, d).compile()

    # Percolation-fill prime FIRST: the fused packed fill
    # (ops/packfill.py) is the first device program the main thread
    # dispatches, and its ~1 MB executable load is most of the percolation
    # wall beyond the 0.5 s fill itself — priming it here moves that load
    # into the read/threshold window when the CLI starts the warm-up at
    # reader-metadata time.  The per-direction ``fill_events`` gate the
    # main thread's fill dispatch (props/tortuosity.py) so the same program
    # is never compiled from two threads; each is set even on failure so
    # the main thread can proceed and compile on demand.
    if device_percolation and mesh is None and problem == "flow":
        try:
            _prime_fill(direction)
            if shape[-1] % 8 == 0:
                from ..ops.masks import _unpack_jit

                packed = jax.ShapeDtypeStruct(
                    (shape[0], shape[1], shape[2] // 8), jnp.uint8)
                _unpack_jit().lower(packed).compile()
        except Exception:
            pass  # fill prime is best-effort; the solver primes below
            # must still run (the main thread compiles the fill on demand)
        finally:
            _mark_fill(direction)
    else:
        _mark_fill(direction)

    # ABSTRACT warm-up (default): every program the solve will hit is
    # AOT-primed from ShapeDtypeStructs — lower().compile() shares the
    # loaded executable with the later real call (measured 0.215 s first
    # real call vs seconds cold), and eval_shape derives the pytree
    # structures, so the thread NEVER creates dummy device data or executes
    # dummy programs.  The eager fallback (dummy all-ones volume) remains
    # for configurations whose preconditioner construction needs values
    # (sa, jacobi, cheby) and for sharded meshes (GSPMD shardings must
    # propagate from committed arrays).
    resolved = "gmg" if precond in ("auto", None) else precond
    abstract = (mesh is None and method in ("cg", "pcg")
                and resolved == "gmg")
    # bool avals: the real drivers always pass a BOOLEAN active mask
    # (ops/masks.py upload_mask / ops/packfill.py both produce bool), and
    # an AOT-primed executable is only shared when the avals match exactly
    # — an int8 prime would compile a dead program and leave the real
    # build cold.
    if abstract:
        ones = jax.ShapeDtypeStruct(tuple(shape), jnp.bool_)
    else:
        ones = jnp.ones(shape, jnp.bool_)
        if mesh is not None:
            from ..parallel.mesh import shard_volume

            ones = shard_volume(ones, mesh)
    if problem == "cell":
        return _warm_cell(ones, dx, storage_name, mesh, precond,
                          precond_opts, method, inner_dtype, outer_dtype,
                          eps)
    if abstract:
        _build_system.lower(ones, direction, vlo, vhi, dx, storage_name,
                            hi_plane).compile()
        from functools import partial

        system, x0 = jax.eval_shape(
            partial(_build_system, direction=direction, vlo=vlo, vhi=vhi,
                    dx=dx, storage=storage_name, hi_plane=hi_plane), ones)
    else:
        system, x0 = _build_system(ones, direction, vlo, vhi, dx,
                                   storage_name, hi_plane)
    _mark_build(direction)
    # make_precond handles abstract systems for gmg (preconditioners.py
    # from_system primes the hierarchy program and shape-infers the levels)
    M = make_precond(system, precond, precond_opts, method)

    from .cg import _cg_chunk, _rel0
    from .preconditioners import GalerkinMGPreconditioner

    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu and method in ("cg", "pcg")
            and isinstance(M, GalerkinMGPreconditioner)):
        if abstract:
            r0 = jax.eval_shape(lambda s, x: s.initial_residual(x),
                                system, x0)
            dtype = jnp.dtype(r0.dtype)
            scalar = jax.ShapeDtypeStruct((), dtype)
            denom = scalar
            _rel0.lower(r0, denom, scalar).compile()
            state = (r0, r0, r0, scalar,
                     jax.ShapeDtypeStruct((), jnp.int32), scalar,
                     jax.ShapeDtypeStruct((), jnp.bool_))
        else:
            r0 = system.initial_residual(x0)
            dtype = r0.dtype
            denom = jnp.asarray(system.b_norm, dtype)
            rel0, done0 = _rel0(r0, denom, jnp.asarray(eps, dtype))
            state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
                     jnp.zeros((), dtype), jnp.array(0, jnp.int32), rel0,
                     done0)
        # mirror of solve/cg.py _cg_chunked_loop's call (eps stays a
        # Python float there too — the compile keys must match exactly)
        _cg_chunk.lower(system, M, state, denom, eps, chunk=16).compile()
    if inner_dtype is not None and (
            jnp.dtype(inner_dtype) != jnp.dtype(outer_dtype)):
        x_hi = (jax.ShapeDtypeStruct(x0.shape, jnp.dtype(outer_dtype))
                if abstract else x0.astype(outer_dtype))
        _outer_residual.lower(system, x_hi,
                              jnp.dtype(outer_dtype).name).compile()
        if abstract:
            _prime_refine_glue(system, tuple(x0.shape), inner_dtype,
                               outer_dtype)

    # Everything the FIRST direction's solve needs is primed; release
    # join() now so later-direction primes below never sit on its
    # critical path.
    if main_ready is not None:
        main_ready.set()

    # Later-direction primes (CLI ``direction = All``): the packed fill
    # and the system build are the only direction-STATIC executables — the
    # chunked-CG / residual / refine programs key on shapes only and are
    # shared.  Priming them here overlaps their tunnel load with the first
    # direction's solve instead of serializing at the head of each later
    # direction.  Entries are ``(direction, hi_plane)`` pairs — hi_plane is
    # per-direction on a padded mesh (only direction 0 pins the outlet
    # plane).  The FILL prime runs first and signals its own event
    # (fill_events[d]) the moment it's done — that direction's percolation
    # dispatch (props/tortuosity.py wait_fill) must never sit behind the
    # system-build compile it doesn't need; the build prime then signals
    # build_events[d], which gates the post-percolation _build_system call
    # (wait_build).  Each prime's failure is isolated so the rest still run.
    for d, hp in _norm_extra_dirs(extra_dirs):
        if device_percolation and mesh is None:
            try:
                _prime_fill(d)
            except Exception:
                pass
        _mark_fill(d)
        try:
            _build_system.lower(ones, d, vlo, vhi, dx, storage_name,
                                hp).compile()
        except Exception:
            pass
        finally:
            _mark_build(d)


def _prime_refine_glue(system, shape, inner_dtype, outer_dtype):
    """AOT-prime the refinement loop's jitted glue programs (refine.py
    `_round0_estimate` / `_scale_inner_rhs` / `_accumulate` / `_assemble_hi`)
    from ShapeDtypeStructs — ~1.3 s of first-solve tunnel loads otherwise
    (measured 512^3, scripts/deffprof.py)."""
    import jax
    import jax.numpy as jnp

    from .refine import (_accumulate, _assemble_hi, _round0_estimate,
                         _scale_inner_rhs)

    inner = jnp.dtype(inner_dtype)
    outer = jnp.dtype(outer_dtype)
    vol_hi = jax.ShapeDtypeStruct(shape, outer)
    vol_lo = jax.ShapeDtypeStruct(shape, inner)
    s64 = jax.ShapeDtypeStruct((), jnp.float64)
    _round0_estimate.lower(system, vol_hi).compile()
    # round 0 scales an inner-dtype residual; later rounds an outer-dtype one
    _scale_inner_rhs.lower(vol_lo, s64, inner.name).compile()
    _scale_inner_rhs.lower(vol_hi, jax.ShapeDtypeStruct((), outer),
                           inner.name).compile()
    _accumulate.lower(vol_hi, s64, vol_lo).compile()
    _accumulate.lower(vol_hi, jax.ShapeDtypeStruct((), outer),
                      vol_lo).compile()
    _assemble_hi.lower(system, vol_hi, outer.name).compile()


def _warm_cell(ones, dx, storage_name, mesh, precond, precond_opts, method,
               inner_dtype, outer_dtype, eps):
    """Prime the homogenization (periodic cell problem) solver programs:
    hierarchy build + the chunked-CG program (lanes or mono, mirroring
    effective_diffusivity's use_lanes gate) + the f64 outer residual.
    AOT lower().compile() only — the dummy values never execute; with an
    abstract ``ones`` (ShapeDtypeStruct from _warm) nothing touches the
    device at all."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..props.effective_diffusivity import _build_cell_system
    from .cg import _cg_chunk
    from .lanes import use_lanes
    from .refine import make_precond, _outer_residual

    if jax.default_backend() != "tpu" or method not in ("cg", "pcg"):
        return
    abstract = not isinstance(ones, jax.Array)
    active = (jax.ShapeDtypeStruct(tuple(ones.shape), jnp.bool_)
              if abstract else ones.astype(bool))
    shape = active.shape
    n_total = int(shape[0]) * int(shape[1]) * int(shape[2])
    storage = jnp.dtype(storage_name)
    # NOTE: on a mesh the driver may still choose lockstep lanes (the
    # use_lanes gate divides by the device count since r5), but sharded
    # lanes cannot be AOT-primed from plain avals (the programs are
    # sharding-specialized), so mesh warm-up keeps priming the mono
    # sharded programs — the hierarchy build and outer residual are shared
    # either way; the lanes chunk program then compiles on first use.
    lanes = (mesh is None and inner_dtype is not None
             and use_lanes(n_total, 3, method,
                           inner_bytes=jnp.dtype(inner_dtype).itemsize,
                           outer_bytes=jnp.dtype(outer_dtype).itemsize))
    if lanes:
        from .lanes import (LaneSystem, _cg_chunk_lanes, _outer_residual_lanes,
                            _rel0_lanes)

        L = 3
        if abstract:
            for k in range(3):
                _build_cell_system.lower(active, k, tuple(dx),
                                         storage_name).compile()

            def _prep(a):
                systems = [_build_cell_system(a, k, tuple(dx),
                                              storage_name)[0]
                           for k in range(3)]
                lsys = LaneSystem.from_systems(systems)
                r0 = lsys.initial_residual(
                    jnp.zeros(lsys.r0_b.shape, storage))
                return lsys, lsys.base(), r0

            lsys, base, r0 = jax.eval_shape(_prep, active)
            M = make_precond(base, precond, precond_opts)
            vec = jax.ShapeDtypeStruct((L,), storage)
            denom = vec
            _rel0_lanes.lower(r0, denom,
                              jax.ShapeDtypeStruct((), storage)).compile()
            state = (r0, r0, r0, vec,
                     jax.ShapeDtypeStruct((L,), jnp.int32), vec,
                     jax.ShapeDtypeStruct((L,), jnp.bool_))
        else:
            systems = [_build_cell_system(active, k, tuple(dx),
                                          storage_name)[0]
                       for k in range(3)]
            lsys = LaneSystem.from_systems(systems)
            M = make_precond(lsys.base(), precond, precond_opts)
            r0 = lsys.initial_residual(jnp.zeros(lsys.r0_b.shape, storage))
            denom = jnp.ones((L,), storage)
            rel0, done0 = _rel0_lanes(r0, denom, jnp.asarray(eps, storage))
            state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
                     jnp.zeros((L,), storage), jnp.zeros((L,), jnp.int32),
                     rel0, done0)
        # chunk MIRRORS cg_lanes's default: max(2, 16 // L)
        _cg_chunk_lanes.lower(lsys, M, state, denom, float(eps),
                              max(2, 16 // L)).compile()
        if inner_dtype is not None and (
                jnp.dtype(inner_dtype) != jnp.dtype(outer_dtype)):
            x = jax.ShapeDtypeStruct((L,) + tuple(shape),
                                     jnp.dtype(outer_dtype))
            _outer_residual_lanes.lower(
                lsys, x, jnp.dtype(outer_dtype).name).compile()
            if abstract:
                from .lanes import (_accumulate_lanes, _assemble_hi_lanes,
                                    _round0_estimate_lanes,
                                    _scale_inner_rhs_lanes)

                inner = jnp.dtype(inner_dtype)
                outer = jnp.dtype(outer_dtype)
                lvol_lo = jax.ShapeDtypeStruct((L,) + tuple(shape), inner)
                lvec64 = jax.ShapeDtypeStruct((L,), jnp.float64)
                lbool = jax.ShapeDtypeStruct((L,), jnp.bool_)
                _round0_estimate_lanes.lower(lsys, x).compile()
                _scale_inner_rhs_lanes.lower(lvol_lo, lvec64, lbool,
                                             inner.name).compile()
                _scale_inner_rhs_lanes.lower(
                    x, jax.ShapeDtypeStruct((L,), outer), lbool,
                    inner.name).compile()
                _accumulate_lanes.lower(x, lvec64, lvol_lo).compile()
                _accumulate_lanes.lower(
                    x, jax.ShapeDtypeStruct((L,), outer), lvol_lo).compile()
                _assemble_hi_lanes.lower(lsys, x, outer.name).compile()
        return
    if abstract:
        for k in range(3):
            _build_cell_system.lower(active, k, tuple(dx),
                                     storage_name).compile()
        system, x0 = jax.eval_shape(
            partial(_build_cell_system, k=0, dx=tuple(dx),
                    storage=storage_name), active)
    else:
        system, x0 = _build_cell_system(active, 0, tuple(dx), storage_name)
    M = make_precond(system, precond, precond_opts, method)
    from .preconditioners import GalerkinMGPreconditioner

    if isinstance(M, GalerkinMGPreconditioner):
        from .cg import _rel0

        if abstract:
            r0 = jax.eval_shape(lambda s, x: s.initial_residual(x),
                                system, x0)
            scalar = jax.ShapeDtypeStruct((), jnp.dtype(r0.dtype))
            denom = scalar
            _rel0.lower(r0, denom, scalar).compile()
            state = (r0, r0, r0, scalar,
                     jax.ShapeDtypeStruct((), jnp.int32), scalar,
                     jax.ShapeDtypeStruct((), jnp.bool_))
        else:
            r0 = system.initial_residual(x0)
            denom = jnp.asarray(1.0, r0.dtype)
            rel0, done0 = _rel0(r0, denom, jnp.asarray(eps, r0.dtype))
            state = (jnp.zeros_like(r0), r0, jnp.zeros_like(r0),
                     jnp.zeros((), r0.dtype), jnp.array(0, jnp.int32), rel0,
                     done0)
        _cg_chunk.lower(system, M, state, denom, float(eps),
                        chunk=16).compile()
    if inner_dtype is not None and (
            jnp.dtype(inner_dtype) != jnp.dtype(outer_dtype)):
        x_hi = (jax.ShapeDtypeStruct(tuple(x0.shape), jnp.dtype(outer_dtype))
                if abstract else x0.astype(outer_dtype))
        _outer_residual.lower(system, x_hi,
                              jnp.dtype(outer_dtype).name).compile()
        if abstract:
            _prime_refine_glue(system, tuple(x0.shape), inner_dtype,
                               outer_dtype)


class SolverWarmup:
    """Best-effort background prime of the solve-path programs."""

    def __init__(self, warm_args, *, primary_direction, extra_dirs=()):
        # ``warm_args``: _warm's positional tuple (built by maybe_start).
        # The direction registry is passed EXPLICITLY — never sliced back
        # out of the opaque tuple — so growing _warm's signature can't
        # silently desynchronize the event registries.
        self._primary = primary_direction
        dirs = (primary_direction,
                *(e[0] for e in _norm_extra_dirs(extra_dirs)))
        self.fill_events = {d: threading.Event() for d in dirs}
        self.build_events = {d: threading.Event() for d in dirs}
        self.main_ready = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=warm_args, daemon=True,
            name="oi-solver-warmup"
        )
        self._thread.start()

    def _run(self, *args):
        try:
            _warm(*args, fill_events=self.fill_events,
                  build_events=self.build_events,
                  main_ready=self.main_ready)
        except Exception:
            pass  # warm-up is opportunistic; the real solve compiles on demand
        finally:
            self.main_ready.set()
            for ev in (*self.fill_events.values(),
                       *self.build_events.values()):
                ev.set()

    @staticmethod
    def _wait(ev, what, direction, timeout):
        if ev is None:
            return  # unregistered direction: caller compiles on demand
            # (disjoint programs)
        if not ev.wait(timeout):
            # surface the stall instead of proceeding silently: the caller
            # will now compile the same program the thread may still be
            # compiling — a duplicate-compile hazard worth a breadcrumb
            # (remote compiles vary 50-575 s; see CLAUDE.md)
            import sys

            print(f"openimpala_tpu: solver warm-up {what} prime for "
                  f"direction {direction} still running after {timeout:.0f}s"
                  f" — proceeding; a duplicate compile may follow",
                  file=sys.stderr, flush=True)

    def wait_fill(self, direction=None, timeout: float = 600.0):
        """Block until ``direction``'s percolation-fill program is primed
        (set the moment the fill prime finishes — never behind that
        direction's system-build compile — and unconditionally when the
        thread exits); the main thread must not compile the same program
        concurrently.  Logs to stderr on timeout."""
        d = self._primary if direction is None else direction
        self._wait(self.fill_events.get(d), "fill", d, timeout)

    def wait_build(self, direction=None, timeout: float = 600.0):
        """Block until ``direction``'s system-build executable is primed
        (for the primary direction that happens inside the main prime;
        ``join()`` already covers it).  Call before ``_build_system`` for a
        LATER direction of a shared ``direction=All`` handle."""
        d = self._primary if direction is None else direction
        self._wait(self.build_events.get(d), "system-build", d, timeout)

    def join(self, timeout: float = 600.0):
        """Wait until every program the FIRST direction's solve dispatches
        is primed.  After ``main_ready`` the thread only compiles
        later-direction fill/build executables — disjoint from the FIRST
        direction's solve, safe to overlap; a LATER direction's call must
        additionally ``wait_build(direction)`` before its system build."""
        if not self.main_ready.wait(timeout):
            self._thread.join(timeout)


def maybe_start(shape, direction, vlo, vhi, dx, storage_name, hi_plane, mesh,
                precond, precond_opts, method, inner_dtype, outer_dtype,
                eps, device_percolation: bool = False,
                problem: str = "flow",
                extra_dirs: tuple = ()) -> SolverWarmup | None:
    """Start the warm-up thread when it can plausibly pay for itself: TPU
    backend, a volume large enough that program load dominates (the
    percolation fill it overlaps with also scales with volume), and a host
    core to spare — executable deserialization is local CPU work, so on a
    single-core host the "overlap" just serializes with (and slows) a HOST
    flood fill; measured 512^3: 16.9 s -> 23 s with the thread forced on a
    1-core host against the native BFS.  ``device_percolation``: the fill
    runs on the TPU (ops/packfill.py), so the core's only competing work is
    packbits + wire waits — the warm-up overlaps those even on one core
    (measured r4: 12.4 s -> 9.9 s one-shot 512^3)."""
    import os

    import jax

    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    # the cell problem has no percolation fill at all — the competing host
    # work (voxel read + threshold) releases the GIL, so the overlap pays
    # even on one core (measured: CLI homogenization primes at
    # reader-metadata time, scripts/deffprof.py)
    host_fill_competes = problem == "flow" and not device_percolation
    if (os.cpu_count() or 1) < 2 and host_fill_competes:
        return None
    if shape[0] * shape[1] * shape[2] < 192 ** 3:
        return None
    extra = tuple(e for e in _norm_extra_dirs(extra_dirs)
                  if e[0] != direction)
    warm_args = (shape, direction, float(vlo), float(vhi), tuple(dx),
                 storage_name, hi_plane, mesh, precond, precond_opts,
                 method, inner_dtype, outer_dtype, float(eps),
                 problem, device_percolation, extra)
    return SolverWarmup(warm_args, primary_direction=direction,
                        extra_dirs=extra)
