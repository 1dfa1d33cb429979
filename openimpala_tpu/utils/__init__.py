"""Shared utilities: direction parsing, logging, timers."""

from .common import parse_direction, DIRECTIONS, direction_name

__all__ = ["parse_direction", "DIRECTIONS", "direction_name"]
