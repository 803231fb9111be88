#!/usr/bin/env python
"""100x EVENTS-replication probe for events_markov_attribution —
same machinery as scale_probe_r12_100x, list swapped."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe_r12_100x as base  # noqa: E402

base.QUERIES = ["events_markov_attribution"]

if __name__ == "__main__":
    base.main()
