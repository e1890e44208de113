"""Event-table (time-series) declared queries — batch-checkable shapes of
the streaming operators (SURVEY §2.10 T3). Filled alongside streaming/."""

from __future__ import annotations
