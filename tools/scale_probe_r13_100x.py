#!/usr/bin/env python
"""100x EVENTS-replication probe for the round-13 gate promotions and
the new inference columns — verdict-r12 #8 explicitly asked for these
rows at the SAME probe script version, so this file reuses
scale_probe_r12_100x's replication + timing machinery verbatim and
only swaps the query list:

- events_policy_ips_snips / events_uplift_qini_cutpoints — promoted
  this round, probe rows requested post-promotion;
- events_ab_msprt_users / stream_msprt_monitor_users /
  events_ab_confidence_sequence_users — the user-grain production
  monitors (one user-grain min-aggregate pass, then O(days));
- events_aipw_doubly_robust / events_ab_rmst — re-probed because
  round 13 added the influence-function / Greenwood variance columns
  (one extra moment per cell, same O(strata)/O(distinct-t) epilogue).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe_r12_100x as base  # noqa: E402

base.QUERIES = [
    "events_policy_ips_snips",
    "events_uplift_qini_cutpoints",
    "events_ab_msprt_users",
    "stream_msprt_monitor_users",
    "events_ab_confidence_sequence_users",
    "events_aipw_doubly_robust",
    "events_ab_rmst",
]

if __name__ == "__main__":
    base.main()
