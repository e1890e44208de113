"""Reference-parity rootfs canned queries (P1-P5, O1, U1) over a
deterministic in-memory fixture."""

from __future__ import annotations
