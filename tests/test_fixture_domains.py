"""Fixture-domain guards (ADVICE r01): queries that rely on exact-integer
restatements assume specific properties of the driver-generated parquet.
The driver REGENERATES testdata between rounds, so these assumptions are
asserted here — drift fails loudly instead of surfacing as a silent
cross-engine divergence in a downstream query.

Guarded assumptions:
  * events.value and orders.o_totalprice are 2-decimal-exact doubles inside
    DECIMAL(8,2) / DECIMAL(12,2) range (the `cents` trick in the analytics
    pack: Spark non-ANSI overflow -> NULL vs DuckDB -> error would otherwise
    diverge);
  * psi_drift_report's per-bin ln(ratio)*1e6 quantization is nowhere near an
    integer boundary (JVM Math.log vs libm log may differ in the last ulp;
    a flip at floor() would shift a whole micro-nat, scaled by the count
    term).
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'")
    yield con
    con.close()


def test_events_value_is_2dp_exact_and_bounded(ddb):
    lo, hi, bad = ddb.execute(
        """
        SELECT MIN(value), MAX(value),
               SUM(CASE WHEN ABS(value * 100 - ROUND(value * 100)) > 1e-6
                        THEN 1 ELSE 0 END)
        FROM events
        """
    ).fetchone()
    assert lo is not None and lo >= 0, lo
    assert hi < 999999.99, f"events.value {hi} would overflow DECIMAL(8,2)"
    assert bad == 0, f"{bad} events.value rows are not 2-decimal-exact"


def test_orders_totalprice_is_2dp_exact_and_bounded(ddb):
    lo, hi, bad = ddb.execute(
        """
        SELECT MIN(o_totalprice), MAX(o_totalprice),
               SUM(CASE WHEN ABS(o_totalprice * 100 - ROUND(o_totalprice * 100)) > 1e-6
                        THEN 1 ELSE 0 END)
        FROM orders
        """
    ).fetchone()
    assert lo is not None and lo >= 0, lo
    assert hi < 9999999999.99, f"o_totalprice {hi} would overflow DECIMAL(12,2)"
    assert bad == 0, f"{bad} o_totalprice rows are not 2-decimal-exact"


def test_psi_quantization_clear_of_integer_boundaries(ddb):
    """Recompute psi_drift_report's per-bin ratios on the live fixture and
    assert ln(ratio)*1e6 sits > 1e-4 away from the nearest integer — several
    orders of magnitude beyond any JVM-vs-libm last-ulp difference, so
    floor() cannot flip between engines."""
    rows = ddb.execute(
        """
        WITH b AS (
          SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       // 5000000, 9) AS bin,
                 SUM(CASE WHEN o_orderdate <  TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS nb,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS nc
          FROM orders GROUP BY 1
        )
        SELECT bin, nb, nc,
               (SELECT SUM(nb) FROM b) AS tb,
               (SELECT SUM(nc) FROM b) AS tc
        FROM b WHERE nb > 0 AND nc > 0
        """
    ).fetchall()
    assert rows, "psi fixture produced no populated bins"
    for bin_, nb, nc, tb, tc in rows:
        ratio = (nc * tb) / (nb * tc)
        q = math.log(ratio) * 1e6
        dist = abs(q - round(q))
        assert dist > 1e-4, (
            f"bin {bin_}: ln(ratio)*1e6 = {q!r} is {dist:.2e} from an integer "
            "— floor() quantization could flip between engines"
        )


def test_gini_rank_moment_headroom(ddb):
    """gini_customer_spend's s1 = SUM(rank * cents) per segment: Spark's
    bigint SUM wraps silently where DuckDB promotes to HUGEINT, so assert
    the worst-case bound n*(n+1)/2 * max_cents (global n >= any segment's
    n) keeps orders of magnitude below 2^63 on the live fixture.  The
    docstring's documented ceiling is ~sf30; this guard makes regeneration
    drift (or an unexpectedly large sf) fail loudly instead of silently
    diverging."""
    n, mx = ddb.execute(
        """
        WITH s AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS cents
          FROM orders GROUP BY 1
        )
        SELECT COUNT(*), MAX(cents) FROM s
        """
    ).fetchone()
    worst_s1 = n * (n + 1) // 2 * mx
    assert worst_s1 < 2**62, (
        f"n={n}, max_cents={mx}: worst-case SUM(i*cents)={worst_s1} is within "
        "2x of int64 wraparound — re-rank gini over dollars (cents DIV 100)"
    )


def test_perceptron_feature_headroom(ddb):
    """perceptron_training_rounds' int64 margins: x1 (totalprice in hundreds
    of dollars) must stay small enough that w1*x1 after 3 rounds keeps
    orders of magnitude below 2^63 (docstring bound assumes max_x1 ~ 6000)."""
    (hi,) = ddb.execute(
        "SELECT MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 10000)"
        " FROM orders"
    ).fetchone()
    assert hi < 10_000, hi


def test_ewma_cents_headroom(ddb):
    """ewma_purchase_values' numerator: max cents * 2^16 must not overflow
    (trivially true for the DECIMAL(8,2) domain, asserted so regeneration
    drift can't break it silently)."""
    (hi,) = ddb.execute(
        "SELECT MAX(CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)) FROM events"
    ).fetchone()
    assert hi * (1 << 16) < 2**62, hi


def test_bigram_ln_quantization_clear_of_integer_boundaries(ddb):
    """bigram_lm_xent (and token_entropy) quantize floor(ln(c)*1e6) of
    INTEGER counts: verify every distinct count value in the live fixture's
    bigram tables sits well clear of a quantization boundary, so a JVM-vs-
    libm last-ulp difference can never flip a micro-nat."""
    import numpy as np

    counts = [
        r[0]
        for r in ddb.execute(
            """
            WITH toks AS (
              SELECT list_filter(string_split(lower(trim(text)), ' '),
                                 x -> x <> '') AS t
              FROM documents),
            big AS (
              SELECT t[i] AS a, t[i+1] AS b
              FROM toks, unnest(generate_series(1, len(t)-1)) AS u(i)
              WHERE len(t) > 1),
            cp AS (SELECT a, b, COUNT(*) AS c FROM big GROUP BY a, b),
            ch AS (SELECT a, SUM(c) AS c FROM cp GROUP BY a)
            SELECT DISTINCT c FROM cp UNION SELECT DISTINCT c FROM ch
            """
        ).fetchall()
        if r[0] > 1
    ]
    q = np.log(np.array(counts, dtype=np.float64)) * 1e6
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(c)*1e6 within {worst:.2e} of an integer boundary"


def test_zipf_ln_quantization_clear_of_boundaries(ddb):
    """zipf_exponent quantizes floor(ln(int)*1e3) of ranks 1..1000 and of
    the top-1000 token counts: assert every argument is clear of a milli-nat
    boundary (ln(1) = 0 is exactly representable and sits ON the boundary
    with an exact value in both engines, so it is excluded)."""
    import numpy as np

    counts = [
        r[0]
        for r in ddb.execute(
            """
            SELECT c FROM (
              SELECT COUNT(*) AS c,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS r
              FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS t
                    FROM documents) u
              WHERE t <> '' GROUP BY t) WHERE r <= 1000
            """
        ).fetchall()
    ]
    args = np.array([x for x in (list(range(2, 1001)) + counts) if x > 1],
                    dtype=np.float64)
    q = np.log(args) * 1e3
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-6, f"ln(x)*1e3 within {worst:.2e} of an integer boundary"


def test_bm25_idf_quantization_clear_of_boundaries(ddb):
    """bm25_topk quantizes floor(ln((2N+2)/(2df+1))*1e6) once per query
    term (the 3 highest-df terms): assert each sits well clear of a
    micro-nat boundary on the live fixture so JVM-vs-libm last-ulp drift
    can never flip the quantized IDF between engines."""
    rows = ddb.execute(
        """
        WITH toks AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                         x -> x <> '') AS t
                      FROM documents),
        st AS (SELECT COUNT(*) AS nd FROM toks),
        tf AS (SELECT doc_id, term FROM (
                 SELECT row_number() OVER () AS doc_id, unnest(t) AS term FROM toks)
               GROUP BY doc_id, term),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        SELECT df, (SELECT nd FROM st) FROM dfreq ORDER BY df DESC, term LIMIT 3
        """
    ).fetchall()
    assert rows, "bm25 fixture produced no terms"
    for df, nd in rows:
        q = math.log((2 * nd + 2) / (2 * df + 1)) * 1e6
        dist = abs(q - round(q))
        assert dist > 1e-4, (
            f"df={df}: ln((2N+2)/(2df+1))*1e6 = {q!r} is {dist:.2e} from an "
            "integer — floor() quantization could flip between engines"
        )


def test_welch_moment_headroom(ddb):
    """welch_t_test_values' Σx² moment: per-group sum of squared floor-
    dollar values must keep n*ss and s*s far inside int64 (Spark's bigint
    SUM wraps silently where DuckDB promotes to HUGEINT)."""
    rows = ddb.execute(
        """
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(FLOOR(CAST(value AS DECIMAL(8,2))) AS BIGINT)) AS s,
               SUM(CAST(FLOOR(CAST(value AS DECIMAL(8,2))) AS BIGINT)
                   * CAST(FLOOR(CAST(value AS DECIMAL(8,2))) AS BIGINT)) AS ss
        FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
        """
    ).fetchall()
    assert rows
    for et, n, s, ss in rows:
        assert n * ss < 2**60, (et, n * ss)
        assert s * s < 2**60, (et, s * s)


def test_higher_moments_fourth_power_headroom(ddb):
    """higher_moments_report sums d^4 (floor-dollar events.value) in int64:
    Spark's bigint SUM wraps silently where DuckDB promotes to HUGEINT, so
    assert the live fixture's per-group fourth-power sum sits orders of
    magnitude inside 2^62 (measured ~3e12 at sf0.1 vs 4.6e18 — the domain is
    value<~1000 dollars, so headroom scales only linearly with row count)."""
    rows = ddb.execute(
        """
        WITH v AS (SELECT event_type,
                          CAST(FLOOR(CAST(value AS DECIMAL(8,2))) AS BIGINT) AS d
                   FROM events)
        SELECT event_type, SUM(d*d*d*d) FROM v GROUP BY 1
        """
    ).fetchall()
    assert rows
    for et, s4 in rows:
        assert s4 < 2**55, (et, s4)  # 128x slack below the 2^62 cliff


def test_pacf_daily_cents_square_headroom(ddb):
    """pacf_lag2 (and the lag-1 ACF family) sums y^2 where y is a DAILY total
    of purchase cents — y grows linearly with SF over a fixed 30-day span, so
    y^2 grows quadratically: assert n*max(y)^2 stays inside 2^60 on the live
    fixture (at sf0.1: ~4e14 vs 1.2e18; the docstrings document the ~sf10
    ceiling where floor-to-dollars would be needed)."""
    n, ymax = ddb.execute(
        """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          SUM(CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)) AS y
                   FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT COUNT(*), MAX(y) FROM d
        """
    ).fetchone()
    assert n and n > 2, n
    assert n * ymax * ymax < 2**60, (n, ymax)


def test_mutual_info_ln_quantization_clear_of_boundaries(ddb):
    """mutual_information_report quantizes floor(ln(N*nxy/(nx*ny))*1e6) per
    contingency cell: assert every cell ratio on the live fixture sits well
    clear of a micro-nat boundary (ratios can be < 1 — FLOOR of the negative
    log is floor on both engines, but a boundary-adjacent value could still
    flip on a last-ulp libm difference)."""
    rows = ddb.execute(
        """
        WITH x AS (SELECT event_type AS xf,
                          CASE WHEN CAST(value AS DECIMAL(8,2)) > 100
                               THEN 1 ELSE 0 END AS yf
                   FROM events),
        c AS (SELECT xf, yf, COUNT(*) AS nxy FROM x GROUP BY xf, yf)
        SELECT nxy,
               SUM(nxy) OVER (PARTITION BY xf) AS nx,
               SUM(nxy) OVER (PARTITION BY yf) AS ny,
               SUM(nxy) OVER () AS nn
        FROM c
        """
    ).fetchall()
    assert rows
    for nxy, nx, ny, nn in rows:
        q = math.log((nn * nxy) / (nx * ny)) * 1e6
        dist = abs(q - round(q))
        assert dist > 1e-4, (
            f"cell nxy={nxy}: ln-ratio*1e6 = {q!r} is {dist:.2e} from an integer"
        )


def test_dsir_ln_quantization_clear_of_boundaries(ddb):
    """dsir_importance_scores quantizes floor(ln(int)*1e6) of Laplace-
    smoothed hashed-unigram bucket counts (c+1) and the two global
    normalizers (total+64): assert every argument on the live fixture sits
    clear of a micro-nat boundary so JVM-vs-libm last-ulp drift can never
    flip a bucket weight (ln(1)=0 is exact on both engines and excluded)."""
    import numpy as np

    rows = ddb.execute(
        """
        WITH tok AS (
          SELECT source, ('0x' || substr(md5(t), 1, 7))::BIGINT % 64 AS b
          FROM (SELECT source,
                       unnest(string_split(lower(trim(text)), ' ')) AS t
                FROM documents)
          WHERE t <> ''),
        tc AS (SELECT b, COUNT(*) AS c FROM tok WHERE source = 'src0' GROUP BY b),
        rc AS (SELECT b, COUNT(*) AS c FROM tok WHERE source <> 'src0' GROUP BY b)
        SELECT c + 1 FROM tc UNION SELECT c + 1 FROM rc
        UNION SELECT SUM(c) + 64 FROM tc UNION SELECT SUM(c) + 64 FROM rc
        """
    ).fetchall()
    args = np.array([r[0] for r in rows if r[0] and r[0] > 1], dtype=np.float64)
    q = np.log(args) * 1e6
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(x)*1e6 within {worst:.2e} of an integer boundary"


def test_pmi_ln_quantization_clear_of_boundaries(ddb):
    """pmi_top_bigrams quantizes floor(ln(ratio)*1e6) of the association
    ratio for every bigram with count >= 5: assert each candidate ratio on
    the live fixture sits clear of a micro-nat boundary so JVM-vs-libm
    last-ulp drift can never flip a reported PMI (ranking itself uses the
    raw ratio and is transcendental-free)."""
    import numpy as np

    rows = ddb.execute(
        """
        WITH toks AS (SELECT list_filter(string_split_regex(trim(lower(text)),
                                                            '\\s+'),
                                         x -> x <> '') AS t
                      FROM documents),
        uni AS (SELECT unnest(t) AS w FROM toks),
        uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        nu AS (SELECT SUM(c) AS n FROM uc),
        big AS (SELECT t[i] AS a, t[i+1] AS b
                FROM toks, unnest(CASE WHEN len(t) >= 2
                                  THEN generate_series(1, len(t) - 1)
                                  ELSE [] END) AS u(i)),
        bc AS (SELECT a, b, COUNT(*) AS cab FROM big GROUP BY a, b),
        nb AS (SELECT SUM(cab) AS n FROM bc)
        SELECT CAST(bc.cab AS DOUBLE) * CAST(nu.n AS DOUBLE)
                 * CAST(nu.n AS DOUBLE)
               / (CAST(nb.n AS DOUBLE) * CAST(ua.c AS DOUBLE)
                  * CAST(ub.c AS DOUBLE))
        FROM bc CROSS JOIN nu CROSS JOIN nb
        JOIN uc ua ON ua.w = bc.a
        JOIN uc ub ON ub.w = bc.b
        WHERE bc.cab >= 5
        """
    ).fetchall()
    ratios = np.array([r[0] for r in rows], dtype=np.float64)
    q = np.log(ratios) * 1e6
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(ratio)*1e6 within {worst:.2e} of a boundary"


def test_heaps_ln_quantization_clear_of_boundaries(ddb):
    """heaps_law_fit quantizes floor(ln(int)*1e6) of the 10 prefix token
    totals and vocabulary sizes: assert each sits clear of a micro-nat
    boundary on the live fixture."""
    import numpy as np

    rows = ddb.execute(
        """
        WITH nd AS (SELECT COUNT(*) AS nd FROM documents),
        cuts AS (SELECT k, (SELECT (nd * k) // 10 FROM nd) AS cut
                 FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
                      AS v(k)),
        toks AS (SELECT doc_id,
                        unnest(list_filter(string_split_regex(trim(lower(text)),
                                                              '\\s+'),
                                           x -> x <> '')) AS w
                 FROM documents),
        dn AS (SELECT doc_id, COUNT(*) AS ntok FROM toks GROUP BY doc_id),
        fo AS (SELECT w, MIN(doc_id) AS fd FROM toks GROUP BY w)
        SELECT (SELECT SUM(ntok) FROM dn WHERE dn.doc_id < c.cut) AS nk,
               (SELECT COUNT(*) FROM fo WHERE fo.fd < c.cut) AS vk
        FROM cuts c
        """
    ).fetchall()
    args = np.array(
        [v for r in rows for v in r if v and v > 1], dtype=np.float64
    )
    q = np.log(args) * 1e6
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(x)*1e6 within {worst:.2e} of a boundary"


def test_hurst_ln_quantization_clear_of_boundaries(ddb):
    """hurst_exponent_rs quantizes floor(ln(mean R/S)*1e6) once per block
    size: recompute the three mean-R/S values on the live fixture and
    assert each is clear of a micro-nat boundary."""
    import numpy as np

    rows = ddb.execute(
        """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          SUM(CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT))
                            AS x
                   FROM events WHERE event_type = 'purchase' GROUP BY 1),
        i AS (SELECT x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx FROM d),
        f AS (SELECT s.k, i.idx // s.k AS blk, i.idx, i.x
              FROM i CROSS JOIN (VALUES (8), (16), (32)) AS s(k)),
        bs AS (SELECT k, blk, SUM(x) AS sb, COUNT(*) AS cnt
               FROM f GROUP BY k, blk),
        dv AS (SELECT f.k, f.blk, f.idx, f.k * f.x - bs.sb AS dev
               FROM f JOIN bs ON bs.k = f.k AND bs.blk = f.blk
               WHERE bs.cnt = f.k),
        cm AS (SELECT k, blk, dev,
                      SUM(dev) OVER (PARTITION BY k, blk ORDER BY idx
                                     ROWS UNBOUNDED PRECEDING) AS cum
               FROM dv),
        rb AS (SELECT k, blk, MAX(cum) - MIN(cum) AS r_scaled,
                      SUM(dev * dev) AS sdev2
               FROM cm GROUP BY k, blk),
        q AS (SELECT k,
                     CAST(FLOOR(CAST(r_scaled AS DOUBLE)
                                * SQRT(CAST(k AS DOUBLE))
                                / SQRT(CAST(sdev2 AS DOUBLE)) * 1000000)
                          AS BIGINT) AS rs_micro
              FROM rb WHERE sdev2 > 0)
        SELECT CAST(SUM(rs_micro) AS DOUBLE) / (COUNT(*) * 1000000.0)
        FROM q GROUP BY k
        """
    ).fetchall()
    vals = np.array([r[0] for r in rows], dtype=np.float64)
    qv = np.log(vals) * 1e6
    dist = np.abs(qv - np.round(qv))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(mean R/S)*1e6 within {worst:.2e} of a boundary"


def test_ccnet_unigram_ln_quantization_clear_of_boundaries(ddb):
    """ccnet_perplexity_buckets quantizes floor(ln(c)*1e6) of the corpus's
    distinct unigram counts and of the total word count: verify every such
    integer sits well clear of a micro-nat boundary on the live fixture, so
    JVM-vs-libm last-ulp drift can never flip a per-word surprisal."""
    import numpy as np

    counts = [
        r[0]
        for r in ddb.execute(
            """
            WITH toks AS (
              SELECT list_filter(string_split(lower(trim(text)), ' '),
                                 x -> x <> '') AS t
              FROM documents),
            w AS (SELECT unnest(t) AS w FROM toks WHERE len(t) > 0)
            SELECT DISTINCT COUNT(*) AS c FROM w GROUP BY w
            UNION SELECT COUNT(*) FROM w
            """
        ).fetchall()
        if r[0] > 1
    ]
    q = np.log(np.array(counts, dtype=np.float64)) * 1e6
    dist = np.abs(q - np.round(q))
    worst = float(dist.min())
    assert worst > 1e-5, f"ln(c)*1e6 within {worst:.2e} of an integer boundary"


def test_domain_reweighting_cross_product_headroom(ddb):
    """domain_reweighting_plan forms micro_s * N_total in int64: assert the
    live fixture keeps it far under 2^62 so regeneration growth can't wrap
    it silently (the documented ~10M-words-per-source ceiling)."""
    (worst,) = ddb.execute(
        """
        WITH toks AS (
          SELECT source,
                 list_filter(string_split(lower(trim(text)), ' '),
                             x -> x <> '') AS t
          FROM documents),
        w AS (SELECT source, unnest(t) AS w FROM toks WHERE len(t) > 0),
        cw AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
        tot AS (SELECT COUNT(*) AS n FROM w),
        per_src AS (
          SELECT w.source,
                 SUM(CAST(floor(ln(tot.n) * 1000000) AS BIGINT)
                     - CAST(floor(ln(cw.c) * 1000000) AS BIGINT)) AS micro
          FROM w JOIN cw ON cw.w = w.w, tot GROUP BY w.source)
        SELECT MAX(micro) * (SELECT MAX(n) FROM tot) FROM per_src
        """
    ).fetchone()
    assert worst < 2**62, worst
