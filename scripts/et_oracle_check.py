#!/usr/bin/env python3
"""Validates the stream_locf_et / stream_cdc_et / stream_episodes_et /
stream_transitions_et DuckDB oracle SQL against
the engine-semantics simulator (et_sim.py) on real testdata."""
import duckdb
import pandas as pd
from et_sim import load, sim_locf, sim_cdc, norm, DAY_US

TTL_MS = 6 * 3600 * 1000

LOCF_SQL = """
WITH t0 AS (
  SELECT min(epoch_us(ts)) // 86400000000 AS d0 FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS val,
         epoch_us(ts) // 86400000000 AS b
  FROM events, t0 WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND epoch_us(ts) // 86400000000 < t0.d0 + 9
),
bk AS (
  SELECT b, row_number() OVER (ORDER BY b) AS ord, max(tsu) AS bmax
  FROM ev GROUP BY b
),
wm0 AS (
  SELECT ord,
    coalesce(max(bmax) OVER (ORDER BY ord
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000, 0) AS wm
  FROM bk
),
wmt AS (
  SELECT ord, wm, lag(wm) OVER (ORDER BY ord) AS wmm1 FROM wm0
),
r AS (
  SELECT ev.user_id, ev.event_id, ev.tsu, ev.val, bk.ord, w.wm, w.wmm1
  FROM ev JOIN bk USING (b) JOIN wmt w USING (ord)
),
flag AS (
  SELECT r.*,
    CASE WHEN lag(ord) OVER k IS NOT NULL
          AND ord >= lag(ord) OVER k + 2
          AND wmm1 > greatest(lag(tsu) OVER k // 1000 + 21600000,
                              lag(wm) OVER k + 1)
          AND count(val) OVER (PARTITION BY user_id ORDER BY tsu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0
         THEN 1 ELSE 0 END AS boundary
  FROM r
  WINDOW k AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
seg AS (
  SELECT *, sum(boundary) OVER (PARTITION BY user_id
    ORDER BY tsu, event_id) AS sg
  FROM flag
)
SELECT user_id, event_id, tsu AS ts_us, val AS value,
       last_value(val IGNORE NULLS) OVER (PARTITION BY user_id, sg
         ORDER BY tsu, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
FROM seg ORDER BY event_id
"""

CDC_SQL = """
WITH t0 AS (
  SELECT min(epoch_us(ts)) // 86400000000 AS d0 FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu, value,
         epoch_us(ts) // 86400000000 AS b
  FROM events, t0 WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND epoch_us(ts) // 86400000000 < t0.d0 + 9
),
bk AS (
  SELECT b, row_number() OVER (ORDER BY b) AS ord, max(tsu) AS bmax
  FROM ev GROUP BY b
),
wmt AS (
  SELECT ord,
    coalesce(max(bmax) OVER (ORDER BY ord
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000, 0) AS wm
  FROM bk
),
fin AS (SELECT max(bmax) // 1000 AS final_wm FROM bk),
stp AS (
  SELECT user_id, ord, wm, tsu, event_id, value FROM (
    SELECT ev.user_id, bk.ord, w.wm, ev.tsu, ev.event_id, ev.value,
           row_number() OVER (PARTITION BY ev.user_id, bk.ord
             ORDER BY ev.tsu DESC, ev.event_id DESC) AS rn
    FROM ev JOIN bk USING (b) JOIN wmt w USING (ord)
  ) WHERE rn = 1
),
nxt AS (
  SELECT *, lead(ord) OVER (PARTITION BY user_id ORDER BY ord) AS next_ord
  FROM stp
),
ups AS (
  SELECT user_id, tsu AS ts_us, event_id, value, 'upsert' AS op FROM nxt
),
dels AS (
  SELECT n.user_id, n.tsu AS ts_us, n.event_id, n.value, 'delete' AS op
  FROM nxt n
  CROSS JOIN fin
  LEFT JOIN wmt wprev ON wprev.ord = n.next_ord - 1
  WHERE CASE WHEN n.next_ord IS NULL
             THEN fin.final_wm > greatest(n.tsu // 1000 + 21600000, n.wm + 1)
             ELSE n.next_ord >= n.ord + 2
                  AND wprev.wm > greatest(n.tsu // 1000 + 21600000, n.wm + 1)
        END
)
SELECT * FROM (SELECT * FROM ups UNION ALL SELECT * FROM dels)
ORDER BY user_id, ts_us, event_id, op
"""

TRANS_SQL = """
WITH t0 AS (
  SELECT min(epoch_us(ts)) // 86400000000 AS d0 FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type,
         epoch_us(ts) // 86400000000 AS b
  FROM events, t0
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
    AND epoch_us(ts) // 86400000000 < t0.d0 + 9
),
bk AS (
  SELECT b, row_number() OVER (ORDER BY b) AS ord, max(tsu) AS bmax
  FROM ev GROUP BY b
),
wm0 AS (
  SELECT ord,
    coalesce(max(bmax) OVER (ORDER BY ord
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000, 0) AS wm
  FROM bk
),
wmt AS (
  SELECT ord, wm, lag(wm) OVER (ORDER BY ord) AS wmm1 FROM wm0
),
r AS (
  SELECT ev.user_id, ev.event_id, ev.tsu, ev.event_type, bk.ord,
         w.wm, w.wmm1
  FROM ev JOIN bk USING (b) JOIN wmt w USING (ord)
),
p AS (
  SELECT r.user_id, r.event_type AS to_type,
    lag(event_type) OVER k AS from_type,
    CASE WHEN lag(ord) OVER k IS NOT NULL
          AND ord >= lag(ord) OVER k + 2
          AND wmm1 > greatest(lag(tsu) OVER k // 1000 + 21600000,
                              lag(wm) OVER k + 1)
         THEN 1 ELSE 0 END AS evicted
  FROM r
  WINDOW k AS (PARTITION BY user_id ORDER BY tsu, event_id)
)
SELECT user_id, from_type, to_type
FROM p WHERE from_type IS NOT NULL AND evicted = 0
ORDER BY user_id, from_type, to_type
"""

EP_SQL = """
WITH t0 AS (
  SELECT min(epoch_us(ts)) // 86400000000 AS d0 FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ev AS (
  SELECT user_id, epoch_us(ts) AS ivs, epoch_us(ts) + 7200000000 AS ive,
         (epoch_us(ts) + 7200000000) // 86400000000 AS b
  FROM events, t0 WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND epoch_us(ts) // 86400000000 < t0.d0 + 9
),
bk AS (
  SELECT b, row_number() OVER (ORDER BY b) AS ord, max(ive) AS bmax
  FROM ev GROUP BY b
),
wm0 AS (
  SELECT ord,
    coalesce(max(bmax) OVER (ORDER BY ord
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000, 0) AS wm
  FROM bk
),
wmt AS (SELECT ord, wm, lag(wm) OVER (ORDER BY ord) AS wmm1 FROM wm0),
fin AS (SELECT max(bmax) // 1000 AS final_wm FROM bk),
r AS (
  SELECT ev.user_id, ev.ivs, ev.ive, bk.ord, w.wm, w.wmm1
  FROM ev JOIN bk USING (b) JOIN wmt w USING (ord)
),
flag AS (
  SELECT r.*,
    CASE WHEN lag(ive) OVER k IS NULL THEN 1
         WHEN (ord >= lag(ord) OVER k + 2
               AND wmm1 > greatest(lag(ive) OVER k // 1000 + 21600000,
                                   lag(wm) OVER k + 1))
           OR ivs > lag(ive) OVER k + 7200000000
         THEN 1 ELSE 0 END AS brk
  FROM r WINDOW k AS (PARTITION BY user_id ORDER BY ivs, ive)
),
seg AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ivs, ive) AS eid
  FROM flag
),
ep AS (
  SELECT user_id, eid, min(ivs) AS mstart, max(ive) AS mend,
         count(*) AS n_merged, max(ord) AS last_ord
  FROM seg GROUP BY user_id, eid
),
mx AS (SELECT user_id, max(eid) AS last_eid FROM ep GROUP BY user_id)
SELECT e.user_id, e.mstart, e.mend, e.n_merged
FROM ep e
JOIN mx USING (user_id)
JOIN wmt wl ON wl.ord = e.last_ord
CROSS JOIN fin
WHERE e.eid < mx.last_eid
   OR fin.final_wm > greatest(e.mend // 1000 + 21600000, wl.wm + 1)
ORDER BY user_id, mstart
"""

def compare(name, sql_rows, eng):
    """Diff the SQL oracle against the simulator; print the failing pair's
    own rows (not whichever comparison ran last) and report the verdict."""
    ok = norm(sql_rows) == norm(eng)
    if not ok:
        a, b = set(norm(sql_rows)), set(norm(eng))
        print(f"  {name} sql-only:", sorted(a - b)[:5])
        print(f"  {name} eng-only:", sorted(b - a)[:5])
    return ok

if __name__ == "__main__":
    import sys
    from et_sim import sim_episodes, sim_transitions, load_typed
    failed = False
    for sf in ["0.001", "0.01", "0.1"]:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        df = load(sf_dir)

        ok_locf = compare("locf",
            [tuple(r) for r in con.sql(LOCF_SQL).fetchall()],
            sim_locf(df, DAY_US, TTL_MS)[0])
        ok_cdc = compare("cdc",
            [tuple(r) for r in con.sql(CDC_SQL).fetchall()],
            sim_cdc(df, DAY_US, TTL_MS)[0])
        ok_ep = compare("episodes",
            [tuple(r) for r in con.sql(EP_SQL).fetchall()],
            sim_episodes(df, DAY_US, 2 * 3600 * 1_000_000,
                         2 * 3600 * 1_000_000, TTL_MS)[0])
        ok_tr = compare("transitions",
            [tuple(r) for r in con.sql(TRANS_SQL).fetchall()],
            sim_transitions(load_typed(sf_dir), DAY_US, TTL_MS)[0])
        print(f"sf{sf}: locf_sql_match={ok_locf} cdc_sql_match={ok_cdc} "
              f"episodes_sql_match={ok_ep} transitions_sql_match={ok_tr}")
        failed |= not (ok_locf and ok_cdc and ok_ep and ok_tr)
    # a validator that cannot fail loudly validates nothing
    sys.exit(1 if failed else 0)
