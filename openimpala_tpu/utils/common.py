"""Direction enum helpers (reference ``Tortuosity.H:9-38`` Direction enum and
the string parsing in ``Diffusion.cpp:630-648``)."""

DIRECTIONS = {"X": 0, "Y": 1, "Z": 2}
_NAMES = {v: k for k, v in DIRECTIONS.items()}


def parse_direction(d) -> int:
    """Accept 0/1/2 or 'X'/'Y'/'Z' (case-insensitive)."""
    if isinstance(d, str):
        return DIRECTIONS[d.strip().upper()]
    return int(d)


def direction_name(d: int) -> str:
    return _NAMES[int(d)]


def count_true(mask) -> int:
    """Count of True/nonzero entries as ONE jitted program.

    Drivers call this on mesh-sharded arrays; an eager ``jnp.sum`` there
    dispatches a standalone all-reduce program per call, which both wastes
    dispatches on TPU and can deadlock XLA:CPU's in-process rendezvous on
    an oversubscribed host (measured, round-3 dryrun debugging).  int64:
    voxel counts exceed int32 beyond ~1290^3 (x64 is enabled package-wide).
    """
    import jax
    import jax.numpy as jnp

    global _COUNT_TRUE_JIT
    try:
        fn = _COUNT_TRUE_JIT
    except NameError:
        fn = _COUNT_TRUE_JIT = jax.jit(
            lambda a: jnp.sum(a != 0, dtype=jnp.int64))
    return int(fn(mask))


def any_true(mask) -> bool:
    """``bool(mask.any())`` as ONE jitted program (see count_true)."""
    import jax
    import jax.numpy as jnp

    global _ANY_TRUE_JIT
    try:
        fn = _ANY_TRUE_JIT
    except NameError:
        fn = _ANY_TRUE_JIT = jax.jit(lambda a: jnp.any(a != 0))
    return bool(fn(mask))
