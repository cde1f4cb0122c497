"""Deterministic expedia-shaped fixture generator (FIXTURES.md §1-§2).

Stay-duration mix mirrors the reference's observed distribution
(reference README.md:1829-1836): ~89% Short, ~10% Standard, ~0.6% Standard
extended, ~0.3% Long, ~0.13% erroneous (unparseable / co <= ci). hotel_id is
low-cardinality per bucket so distinct-count saturation is reproducible.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

MASK = "0000-00-00 00:00:00"

# (weight, (min_days, max_days)) — negative/zero/malformed handled separately
_BUCKETS = [
    (0.888, (1, 4)),
    (0.10, (5, 10)),
    (0.006, (11, 14)),
    (0.003, (15, 30)),
]


def gen_expedia_rows(n: int, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    base = dt.date(2025, 1, 1)
    rows = []
    for i in range(n):
        ci = base + dt.timedelta(days=rng.randrange(0, 300))
        r = rng.random()
        malformed = None
        if r < 0.0008:
            malformed = "not-a-date"
        elif r < 0.0013:
            malformed = ""
        elif r < 0.0020:
            co = ci - dt.timedelta(days=rng.randrange(0, 4))  # co <= ci
        else:
            acc = 0.0
            dur = 2
            rr = rng.random()
            for w, (lo, hi) in _BUCKETS:
                acc += w
                if rr <= acc:
                    dur = rng.randrange(lo, hi + 1)
                    break
            else:
                dur = rng.randrange(1, 5)
            co = ci + dt.timedelta(days=dur)
        duration = None if malformed is not None else (co - ci).days
        if malformed is not None:
            hotel_bucket = 4
        elif duration < 1:
            hotel_bucket = 4
        elif duration <= 4:
            hotel_bucket = 0
        elif duration <= 10:
            hotel_bucket = 1
        elif duration <= 14:
            hotel_bucket = 2
        else:
            hotel_bucket = 3
        rows.append(
            {
                "id": i,
                "date_time": MASK,
                "site_name": rng.randrange(0, 50),
                "posa_container": rng.randrange(0, 5),
                "user_location_country": rng.randrange(0, 250),
                "user_location_region": rng.randrange(0, 1000),
                "user_location_city": rng.randrange(0, 50000),
                "orig_destination_distance": (
                    None if rng.random() < 0.3 else round(rng.uniform(0, 12000), 4)
                ),
                "user_id": rng.randrange(0, 1_200_000),
                "is_mobile": rng.randrange(0, 2),
                "is_package": rng.randrange(0, 2),
                "channel": rng.randrange(0, 11),
                "srch_ci": malformed if malformed is not None else ci.isoformat(),
                "srch_co": (
                    "2025-06-01" if malformed is not None else co.isoformat()
                ),
                "srch_adults_cnt": rng.randrange(1, 10),
                "srch_children_cnt": rng.randrange(0, 10),
                "srch_rm_cnt": rng.randrange(1, 9),
                "srch_destination_id": rng.randrange(0, 65000),
                "srch_destination_type_id": rng.randrange(1, 10),
                # low cardinality per stay bucket -> distinct saturates
                "hotel_id": hotel_bucket * 10_000 + rng.randrange(0, 120),
            }
        )
    return rows


def write_json_files(rows: list[dict], out_dir: str, num_files: int = 4) -> None:
    """Write rows as N JSON-lines files (N micro-batches for file streaming)."""
    os.makedirs(out_dir, exist_ok=True)
    per = (len(rows) + num_files - 1) // num_files
    for f in range(num_files):
        chunk = rows[f * per : (f + 1) * per]
        with open(os.path.join(out_dir, f"part-{f:04d}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
