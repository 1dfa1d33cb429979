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
