"""Non-vacuousness guards for the linkage-metric and hygiene queries:
the catalog parity test proves Spark == DuckDB; these pin that the
agreed-on values actually witness the north-rule claims (F1 ≥ 0.99 with
complete recall, clustering only amplifies precision loss, the PII pass
redacts something real and leaves nothing behind).  Oracle side only —
no Spark session, fast."""

import duckdb
import pytest

from spellchecker_wasm_spark.queries import CATALOG, TABLES

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_linkage_f1_meets_north_rule(sf_dir):
    """Pair-stage F1 ≥ 0.99 (BASELINE.json metric) with COMPLETE recall:
    SymSpell blocking is lossless for pairs within the edit window, so
    any recall miss is a bug, and precision loss is bounded to hash-slug
    near-collisions."""
    con = _con(sf_dir)
    row = con.sql(CATALOG["linkage_f1"][1]).fetchone()
    n_truth, n_pred, n_tp, precision, recall, f1 = row
    assert n_truth > 0 and n_truth == 3 * (n_truth // 3)
    assert recall == 1.0
    assert f1 >= 0.99
    assert n_pred >= n_truth


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cluster_f1_amplifies_only_precision(sf_dir):
    """Connected components can merge but never split predicted pairs:
    induced recall stays 1.0, induced precision ≤ pair precision, and
    the induced pair count can only grow."""
    con = _con(sf_dir)
    p = con.sql(CATALOG["linkage_f1"][1]).fetchone()
    c = con.sql(CATALOG["linkage_cluster_f1"][1]).fetchone()
    assert c[0] == p[0]            # same truth set
    assert c[4] == 1.0             # recall through clustering
    assert c[1] >= p[1]            # induced pairs ⊇ scored pairs
    assert c[3] <= p[3]            # precision can only fall
    assert c[5] >= 0.96            # still near the rule at this fixture


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pii_scrub_bites_and_is_complete(sf_dir):
    """Every ticket had at least one email and one phone planted; after
    scrubbing, neither pattern matches anything and the placeholders are
    present exactly as often as the counters claim."""
    from spellchecker_wasm_spark.queries import _PII_EMAIL, _PII_PHONE
    con = _con(sf_dir)
    sql = CATALOG["pii_scrub"][1]
    lo_e, lo_p, resid_e, resid_p, bad_tokens = con.sql(f"""
        SELECT min(n_emails), min(n_phones),
               sum(len(regexp_extract_all(scrubbed, '{_PII_EMAIL}'))),
               sum(len(regexp_extract_all(scrubbed, '{_PII_PHONE}'))),
               sum(CASE WHEN len(regexp_extract_all(scrubbed, '<EMAIL>'))
                             <> n_emails
                         OR len(regexp_extract_all(scrubbed, '<PHONE>'))
                             <> n_phones
                        THEN 1 ELSE 0 END)
        FROM ({sql})""").fetchone()
    assert lo_e >= 1 and lo_p >= 1
    assert resid_e == 0 and resid_p == 0
    assert bad_tokens == 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_html_extract_shape(sf_dir):
    """The expected extraction is title + newline + body — pinned here so
    the oracle itself can't silently degenerate to echoing the input."""
    con = _con(sf_dir)
    sql = CATALOG["html_extract"][1]
    n, ok_prefix, ok_nl = con.sql(f"""
        SELECT count(*),
               sum(CASE WHEN extracted LIKE 'doc-%' THEN 1 ELSE 0 END),
               sum(CASE WHEN strpos(extracted, chr(10)) > 0
                        THEN 1 ELSE 0 END)
        FROM ({sql})""").fetchone()
    assert n > 0 and ok_prefix == n and ok_nl == n


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_decision_bands_all_populated(sf_dir):
    """The three-way decision is non-vacuous: every band receives pairs
    at both SFs (a threshold that routes everything one way proves
    nothing about the weights)."""
    con = _con(sf_dir)
    rows = dict(con.sql(
        f"SELECT decision, count(*) FROM ({CATALOG['fellegi_sunter'][1]}) "
        "GROUP BY decision").fetchall())
    assert set(rows) == {"match", "possible", "non_match"}, rows
    assert all(v > 0 for v in rows.values()), rows


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_em_feedback_sharpens_weights(sf_dir):
    """The EM M-step must produce parameters that CONFIRM the priors'
    direction: every comparator separates the classes (m > u), and the
    re-derived agreement log-odds 1000*log2(m/u) stays positive — the
    feedback loop sharpens, never inverts, the decision.  This is the
    convergence precondition for iterating fs_em_step -> _FS_WEIGHTS."""
    import math

    con = _con(sf_dir)
    rows = con.sql(CATALOG["fs_em_step"][1]).fetchall()
    assert len(rows) == 4
    for comparator, n_m, am, n_u, au, m_ppm, u_ppm in rows:
        assert n_m > 0 and n_u > 0, comparator
        m = min(max(m_ppm / 1e6, 1e-6), 1 - 1e-6)
        u = min(max(u_ppm / 1e6, 1e-6), 1 - 1e-6)
        assert m > u, (comparator, m, u)
        assert 1000 * math.log2(m / u) > 0, (comparator, m, u)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_match_band_is_pure(sf_dir):
    """The match band auto-accepts ONLY truth pairs (precision 1.0) —
    the whole point of demanding multiply-corroborated agreement — while
    recall stays meaningful (the clerical band holds the rest, it does
    not swallow everything)."""
    con = _con(sf_dir)
    n_truth, n_pred, n_tp, precision, recall, f1 = con.sql(
        CATALOG["fs_quality"][1]).fetchall()[0]
    assert precision == 1.0, (n_pred, n_tp)
    assert 0.3 <= recall < 1.0, recall


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_round2_sharpens_not_degrades(sf_dir):
    """The closed EM loop must behave like EM: iteration-2 decisions are
    MORE confident (clerical band shrinks) and the match band's
    precision does not drop while its recall does not fall.  Evaluated
    oracle-side (both engines proven equal by the catalog rows)."""
    from spellchecker_wasm_spark.queries import (
        _FS_SQL_DEC, _LK_SQL_FIXTURE, _lk_sql_metrics)

    con = _con(sf_dir)
    r2_sql = CATALOG["fs_round2"][1](sf_dir)
    bands1 = dict(con.sql(
        f"SELECT decision, count(*) FROM ({CATALOG['fellegi_sunter'][1]}) "
        "GROUP BY decision").fetchall())
    bands2 = dict(con.sql(
        f"SELECT decision, count(*) FROM ({r2_sql}) "
        "GROUP BY decision").fetchall())
    assert bands2.get("possible", 0) < bands1["possible"], (bands1, bands2)

    q1 = con.sql("WITH RECURSIVE" + _LK_SQL_FIXTURE + _FS_SQL_DEC + """,
fsm AS (SELECT id_a, id_b FROM fsdec WHERE decision = 'match')"""
                 + _lk_sql_metrics("fsm")).fetchall()[0]
    # round-2 match-band metrics: reuse the metric chain on the derived
    # weights by re-deriving them the same way the oracle callable does
    from spellchecker_wasm_spark.queries import (
        _O_FS_EM_STEP, _fs_sql_dec, _fs_weights_from_ppm)
    cols = ("comparator", "n_match", "agree_match", "n_nonmatch",
            "agree_nonmatch", "m_ppm", "u_ppm")
    rows = [dict(zip(cols, r))
            for r in con.sql(_O_FS_EM_STEP).fetchall()]
    w2 = _fs_weights_from_ppm(rows)
    q2 = con.sql("WITH RECURSIVE" + _LK_SQL_FIXTURE + _fs_sql_dec(w2) + """,
fsm AS (SELECT id_a, id_b FROM fsdec WHERE decision = 'match')"""
                 + _lk_sql_metrics("fsm")).fetchall()[0]
    # columns: n_truth, n_pred, n_tp, precision, recall, f1
    assert q2[3] >= q1[3], (q1, q2)   # precision does not drop
    assert q2[4] >= q1[4], (q1, q2)   # recall does not fall
    assert q2[5] > q1[5], (q1, q2)    # F1 strictly improves here


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bcubed_matches_independent_python(sf_dir):
    """bcubed_quality's floor-scaled integer formulation must agree with
    a from-the-definition Python B³ (per-item mean of |C∩L|/|C| and
    |C∩L|/|L|) to within the declared floor-error bound (#cells / 10⁹),
    and witness the north-rule regime: complete B³ recall (truth pairs
    are a subset of predicted pairs, so every entity lands in one
    cluster) with B³ precision ≥ 0.99."""
    from collections import Counter

    from spellchecker_wasm_spark.queries import (
        _LK_SQL_CC, _LK_SQL_FIXTURE)

    con = _con(sf_dir)
    asg = con.sql("WITH RECURSIVE" + _LK_SQL_FIXTURE + _LK_SQL_CC
                  + "SELECT node, component FROM asg").fetchall()
    comp = {n: c for n, c in asg}
    n_p = Counter(comp.values())
    n_t = Counter(n // 10 for n in comp)
    cells = Counter((c, n // 10) for n, c in comp.items())
    n = len(comp)
    bp = sum(v * v / n_p[c] for (c, e), v in cells.items()) / n
    br = sum(v * v / n_t[e] for (c, e), v in cells.items()) / n

    row = con.sql(CATALOG["bcubed_quality"][1]).fetchone()
    n_items, bp_ppb, br_ppb, p, r, f1 = row
    assert n_items == n
    tol = len(cells) / 1e9
    assert abs(p - bp) <= tol, (p, bp)
    assert abs(r - br) <= tol, (r, br)
    assert r == 1.0, r
    assert 0.99 <= p <= 1.0, p   # sf0.001 clusters perfectly; sf0.01 has
    # the one known transitive glue (cluster_f1's precision dip)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ari_consistent_with_bcubed(sf_dir):
    """ARI and B³ must agree on the regime: a perfect clustering gives
    both exactly 1.0; an imperfect one pushes both strictly below 1.0
    (they penalize the same over-merges through different lenses).  Also
    re-derives ARI from its integer components to pin the single-division
    contract."""
    con = _con(sf_dir)
    n_items, a, b, c, num, den, ari = con.sql(
        CATALOG["ari_quality"][1]).fetchone()
    n2 = n_items * (n_items - 1) // 2
    assert num == 2 * (n2 * a - b * c)
    assert den == n2 * (b + c) - 2 * b * c
    assert ari == num / den
    bq = con.sql(CATALOG["bcubed_quality"][1]).fetchone()
    perfect_b3 = bq[3] == 1.0 and bq[4] == 1.0
    assert (ari == 1.0) == perfect_b3, (ari, bq)
    assert 0.99 <= ari <= 1.0, ari


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_calibration_ranks_cleanly(sf_dir):
    """The calibration curve's two fixture findings, pinned: (1) the
    weights never mis-rank — every band at or above the zero cut has
    empirical precision exactly 1.0 (all blocking collisions land
    strictly negative), so 'match' and 'possible' are pure; (2) the r1
    priors ARE pessimistically miscalibrated — at least one negative
    band still holds true matches (the pairs fs_round2's re-derived
    weights recover).  Population check: the bands partition ALL blocked
    candidates, a strict superset of the verified pairs fellegi_sunter
    decides."""
    con = _con(sf_dir)
    rows = sorted(con.sql(CATALOG["fs_calibration"][1]).fetchall())
    assert all(prec == 1.0 for lo, n, tp, prec in rows if lo >= 0), rows
    assert any(tp > 0 for lo, n, tp, prec in rows if lo < 0), rows
    n_cand = sum(n for _, n, _, _ in rows)
    n_verified = con.sql(
        f"SELECT count(*) FROM ({CATALOG['fellegi_sunter'][1]})"
    ).fetchone()[0]
    assert n_cand > n_verified, (n_cand, n_verified)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fs_converged_fixpoint_quality(sf_dir):
    """The converged EM decision must (1) actually fixpoint before the
    iteration cap, (2) drain the clerical band (a fixpoint that still
    abstains hasn't converged in any useful sense on this fixture), and
    (3) end at least as good as iteration 2 on the match band (F1
    non-decreasing vs fs_round2's pinned reading), with precision
    intact."""
    from spellchecker_wasm_spark.queries import (
        _FS_MAX_EM_ITERS, _LK_SQL_FIXTURE, _fs_sql_dec,
        _fs_weights_from_ppm, _lk_sql_metrics)

    con = _con(sf_dir)
    sql = CATALOG["fs_converged"][1](sf_dir)
    bands = dict(con.sql(
        f"SELECT decision, count(*) FROM ({sql}) GROUP BY 1").fetchall())
    n_iters = con.sql(f"SELECT min(n_iters) FROM ({sql})").fetchone()[0]
    assert n_iters < _FS_MAX_EM_ITERS, n_iters
    assert "possible" not in bands, bands

    # match-band metrics at the fixpoint vs at round 2
    from spellchecker_wasm_spark.queries import (
        _FS_EM_COLS, _FS_SQL_EM_SUFFIX, _FS_WEIGHTS, _fs_em_fixpoint)

    def em_rows(w):
        s = ("WITH RECURSIVE" + _LK_SQL_FIXTURE + _fs_sql_dec(w)
             + _FS_SQL_EM_SUFFIX)
        return [dict(zip(_FS_EM_COLS, r)) for r in con.sql(s).fetchall()]

    w_star, _ = _fs_em_fixpoint(em_rows, _FS_WEIGHTS)
    w_r2 = _fs_weights_from_ppm(em_rows(_FS_WEIGHTS))

    def match_metrics(w):
        return con.sql(
            "WITH RECURSIVE" + _LK_SQL_FIXTURE + _fs_sql_dec(w) + """,
fsm AS (SELECT id_a, id_b FROM fsdec WHERE decision = 'match')"""
            + _lk_sql_metrics("fsm")).fetchone()

    m2, mstar = match_metrics(w_r2), match_metrics(w_star)
    assert mstar[5] >= m2[5], (m2, mstar)      # F1 non-decreasing
    assert mstar[3] >= 0.99, mstar             # precision holds


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_monge_elkan_matches_independent_python(sf_dir):
    """scored_pairs_monge_elkan's nested-HOF formulation must agree
    bit-for-bit with a from-the-definition Python Monge-Elkan (mean of
    per-token best normalized-Levenshtein similarities, same leading-
    token window, same left-to-right accumulation), and witness the
    semantic claim: shingle-blocked near-duplicates score high
    (min me_sym ≥ 0.9) while every value stays within [0, 1]."""
    from spellchecker_wasm_spark.queries import _ME_TOKEN_CAP

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def me(src, dst):
        acc = 0.0
        for t in src:
            acc += max(1.0 - lev(t, u) / float(max(len(t), len(u)))
                       for u in dst)
        return acc / len(src)

    con = _con(sf_dir)
    toks = dict(con.sql(
        f"SELECT doc_id, list_slice(list_filter(string_split(text, ' '), "
        f"x -> x <> ''), 1, {_ME_TOKEN_CAP}) FROM documents "
        "WHERE text IS NOT NULL").fetchall())
    rows = con.sql(CATALOG["scored_pairs_monge_elkan"][1]).fetchall()
    assert rows
    for doc_a, doc_b, me_ab, me_ba, me_sym in rows:
        ta, tb = toks[doc_a], toks[doc_b]
        assert me_ab == me(ta, tb), (doc_a, doc_b)
        assert me_ba == me(tb, ta), (doc_a, doc_b)
        assert me_sym == (me_ab + me_ba) / 2.0
        assert 0.0 <= me_ab <= 1.0 and 0.0 <= me_ba <= 1.0
    assert min(r[4] for r in rows) >= 0.9


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_purity_consistent_with_bcubed(sf_dir):
    """The extrinsic-metric shelf must be internally consistent, not
    just individually green: per component Σ nₑ² ≤ maxₑ nₑ · Σ nₑ, so
    purity ≥ B³ precision and inverse purity ≥ B³ recall (within the
    B³ side's declared ppb floor error).  Also re-derives purity from
    the definition in Python.  The no-split regime (inverse purity
    exactly 1.0) is a FIXTURE property of the current linkage chain —
    blocking never splits an entity here — pinned as a derived
    equality against the Python replay rather than hard-coded, so a
    future fixture or clustering change that legitimately splits an
    entity shifts both sides together instead of failing a stale
    constant."""
    from collections import Counter

    from spellchecker_wasm_spark.queries import (
        _LK_SQL_CC, _LK_SQL_FIXTURE)

    con = _con(sf_dir)
    row = con.sql(CATALOG["purity_quality"][1]).fetchone()
    n_items, sum_pmax, sum_emax, p, ip, f = row
    bb = con.sql(CATALOG["bcubed_quality"][1]).fetchone()
    _, _, _, bp, br, _ = bb
    tol = 1e-6
    assert p >= bp - tol, (p, bp)
    assert ip >= br - tol, (ip, br)
    assert 0.0 < ip <= 1.0, ip
    assert f == 2.0 * p * ip / (p + ip)

    asg = con.sql("WITH RECURSIVE" + _LK_SQL_FIXTURE + _LK_SQL_CC
                  + "SELECT node, component FROM asg").fetchall()
    cells = Counter((c, n // 10) for n, c in asg)
    by_comp, by_ent = {}, {}
    for (c, e), v in cells.items():
        by_comp[c] = max(by_comp.get(c, 0), v)
        by_ent[e] = max(by_ent.get(e, 0), v)
    assert n_items == len(asg)
    assert sum_pmax == sum(by_comp.values())
    assert sum_emax == sum(by_ent.values())
    assert p == sum(by_comp.values()) / len(asg)
    # the derived equality that subsumes the old `ip == 1.0` pin: on
    # the current fixtures every entity lands in one component, so the
    # replay's Σ per-entity max equals the item count and ip comes out
    # 1.0 — but the assertion tracks the replay, not the constant
    assert ip == sum(by_ent.values()) / len(asg)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_canopy_blocking_matches_independent_python(sf_dir):
    """canopy_blocking's component-confined greedy must agree exactly
    with a from-the-definition Python canopy (McCallum et al. 2000):
    global ascending-id greedy scan, tight-threshold candidacy
    removal, loose-threshold membership — run WITHOUT the component
    confinement, which also witnesses that the confinement is exact.
    Plus the semantic witnesses: recall >= 0.99, centers < points
    (the tight threshold genuinely absorbs), and every truth pair the
    canopies catch shares >= loose grams with a common center."""
    from spellchecker_wasm_spark.queries import (
        _CANOPY_LOOSE, _CANOPY_TIGHT, _LK_SQL_PAGES)

    con = _con(sf_dir)
    pages = con.sql("WITH " + _LK_SQL_PAGES
                    + " SELECT page_id, title FROM pages").fetchall()
    grams = {pid: frozenset(t[i:i + 3] for i in range(len(t) - 2))
             for pid, t in pages}
    # inverted index -> only gram-sharing pairs have nonzero sim
    inv = {}
    for pid, gs in grams.items():
        for g in gs:
            inv.setdefault(g, []).append(pid)
    sim = {}
    for ids in inv.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sim[(a, b)] = sim.get((a, b), 0) + 1

    def s(a, b):
        return sim.get((a, b) if a < b else (b, a), 0)

    centers, covered = [], set()
    for pid in sorted(grams):             # GLOBAL greedy, no components
        if any(s(c, pid) >= _CANOPY_TIGHT for c in covered):
            continue
        centers.append(pid)
        covered.add(pid)
    memb = {}
    for c in centers:
        memb[c] = {p for p in grams
                   if p == c or s(c, p) >= _CANOPY_LOOSE}
    cand = {(a, b)
            for ms in memb.values()
            for a in ms for b in ms if a < b}

    row = con.sql(CATALOG["canopy_blocking"][1]).fetchone()
    (n_centers, n_cand, n_tp, n_truth, recall,
     n_dropped_components, n_dropped_pages) = row
    # the Python replay has NO component cap, so the equalities below
    # also witness that the default _CANOPY_MAX_COMP never bites on the
    # fixture (drops must say so explicitly)
    assert n_dropped_components == 0 and n_dropped_pages == 0
    assert n_centers == len(centers), (n_centers, len(centers))
    assert n_cand == len(cand), (n_cand, len(cand))
    truth = {(a, b) for a, _ in pages for b, _ in pages
             if a < b and a // 10 == b // 10}
    assert n_truth == len(truth)
    assert n_tp == len(cand & truth)
    assert recall == len(cand & truth) / len(truth)
    assert recall >= 0.99, recall
    assert n_centers < len(pages), "tight threshold never absorbed"
    assert n_cand >= n_tp


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_soft_tfidf_matches_independent_python(sf_dir):
    """scored_pairs_soft_tfidf must agree bit-for-bit with a
    from-the-definition Python replay (distinct ASCII leading tokens,
    reciprocal-df integer weights, scalar Jaro-Winkler θ-gate,
    max-product inner term, left-to-right accumulation in sorted-token
    order, integer-L2 normalization — weights/df/norms all recomputed
    here from raw documents, NOT from the oracle's CTEs), and witness
    the semantics: every score sits in [0, 1] (+1 ulp for the
    perfect-match rounding), near-identical docs reach ≈1, and the
    θ-gate actually bites (some candidate pair scores 0 even though
    plain token overlap would score it)."""
    import math

    from spellchecker_wasm_spark.kernels.jaro import (
        jaro_winkler_similarity)
    from spellchecker_wasm_spark.queries import _ME_TOKEN_CAP, _STF_THETA

    con = _con(sf_dir)
    raw = con.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    toks = {}
    for doc_id, text in raw:
        tt = [t for t in text.split(" ")
              if t != "" and len(t.encode()) == len(t)][:_ME_TOKEN_CAP]
        if tt:
            toks[doc_id] = sorted(set(tt))
    df = {}
    for tt in toks.values():
        for t in tt:
            df[t] = df.get(t, 0) + 1
    w = {d: [1000000 // (df[t] + 1) for t in tt]
         for d, tt in toks.items()}
    n2 = {d: sum(x * x for x in ws) for d, ws in w.items()}

    def soft_tfidf(a, b):
        acc = 0.0
        for t, wt in zip(toks[a], w[a]):
            best = 0.0
            for u, wu in zip(toks[b], w[b]):
                jw = jaro_winkler_similarity(t, u)
                if jw > _STF_THETA:
                    v = jw * wu
                    if v > best:
                        best = v
            acc += wt * best
        return acc / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    rows = con.sql(CATALOG["scored_pairs_soft_tfidf"][1]).fetchall()
    assert rows
    for doc_a, doc_b, stf in rows:
        assert stf == soft_tfidf(doc_a, doc_b), (doc_a, doc_b)
        assert 0.0 <= stf <= 1.0 + 2 ** -50
    assert max(r[2] for r in rows) >= 0.99
    gate_bites = False
    # the θ-gate claim: at least one (t, u) token pair among the scored
    # pairs has 0 < jw ≤ θ (so a gate-free variant would score higher)
    for doc_a, doc_b, _ in rows:
        for t in toks[doc_a]:
            for u in toks[doc_b]:
                jw = jaro_winkler_similarity(t, u)
                if 0.0 < jw <= _STF_THETA:
                    gate_bites = True
                    break
            if gate_bites:
                break
        if gate_bites:
            break
    assert gate_bites


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_suffix_blocking_matches_independent_python(sf_dir):
    """suffix_blocking must agree exactly with a from-the-definition
    Python suffix blocking (Aizawa & Oyama 2005): every suffix of
    length ≥ min_len (whole key when shorter) is a block, blocks
    larger than the cap are dropped, candidates are in-block pairs.
    Plus the semantic witnesses that make it a useful sixth family
    row: on the uniform-slug fixture every candidate is a TRUE pair
    (precision 1.0 — unrelated slugs never share a ≥5-char tail) and
    recall is structurally partial (only head-corrupted variants keep
    a shared suffix), sitting strictly between 0 and the delete-key
    family's 1.0."""
    from spellchecker_wasm_spark.queries import (
        _LK_SQL_PAGES, _SUFFIX_BLOCK_CAP, _SUFFIX_MIN_LEN)

    con = _con(sf_dir)
    pages = con.sql("WITH " + _LK_SQL_PAGES
                    + " SELECT page_id, title FROM pages").fetchall()
    blocks = {}
    for pid, t in pages:
        n = max(len(t) - _SUFFIX_MIN_LEN + 1, 1)
        for i in range(n):
            blocks.setdefault(t[i:], set()).add(pid)
    cand = {(a, b)
            for ids in blocks.values()
            if 2 <= len(ids) <= _SUFFIX_BLOCK_CAP
            for a in ids for b in ids if a < b}
    truth = {(a, b) for a, _ in pages for b, _ in pages
             if a < b and a // 10 == b // 10}

    n_cand, n_tp, n_truth, recall = con.sql(
        CATALOG["suffix_blocking"][1]).fetchone()
    assert n_cand == len(cand), (n_cand, len(cand))
    assert n_truth == len(truth)
    assert n_tp == len(cand & truth)
    assert recall == len(cand & truth) / len(truth)
    assert n_cand == n_tp, "a non-truth pair shared a long suffix"
    assert 0.0 < recall < 1.0, recall


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_affine_gap_matches_independent_python(sf_dir):
    """scored_pairs_affine_gap's recursive-CTE oracle must agree exactly
    with a from-the-definition full-matrix Gotoh in Python (M/X/Y
    matrices, no row-rolling, no closed-form X — a structurally
    different evaluation of the same recurrence) over the REAL blocked
    candidate pairs.  Witnesses: sw_sim ∈ [0, 1] with the perfect-local
    bound sw ≤ 2·min(len); pure-insertion variants reach sim 1.0; and
    affine beats unit-cost intuition somewhere (a pair with a
    contiguous ≥2-gap still scores ≥ 0.5 sim)."""
    from spellchecker_wasm_spark.queries import _LK_SQL_FIXTURE

    NEG = -10 ** 6

    def gotoh(a, b):
        l1, l2 = len(a), len(b)
        M = [[0] * (l2 + 1) for _ in range(l1 + 1)]
        X = [[NEG] * (l2 + 1) for _ in range(l1 + 1)]
        Y = [[NEG] * (l2 + 1) for _ in range(l1 + 1)]
        best = 0
        for i in range(1, l1 + 1):
            for j in range(1, l2 + 1):
                s = 2 if a[i - 1] == b[j - 1] else -1
                M[i][j] = max(0, max(M[i - 1][j - 1], X[i - 1][j - 1],
                                     Y[i - 1][j - 1]) + s)
                Y[i][j] = max(M[i - 1][j] - 2, Y[i - 1][j] - 1)
                X[i][j] = max(M[i][j - 1] - 2, X[i][j - 1] - 1)
                best = max(best, M[i][j])
        return best

    con = _con(sf_dir)
    terms = dict(con.sql(
        "WITH RECURSIVE" + _LK_SQL_FIXTURE
        + " SELECT page_id, title FROM pages").fetchall())
    rows = con.sql(CATALOG["scored_pairs_affine_gap"][1]).fetchall()
    assert rows
    perfect = False
    for id_a, id_b, sw, sw_sim in rows:
        ta, tb = terms[id_a], terms[id_b]
        assert sw == gotoh(ta, tb), (id_a, id_b, ta, tb)
        assert sw_sim == sw / (2 * min(len(ta), len(tb)))
        assert 0.0 <= sw_sim <= 1.0
        if sw_sim == 1.0 and len(ta) != len(tb):
            perfect = True  # a pure-insertion variant aligned perfectly
    assert perfect


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_prefix_jaccard_complete_vs_brute_force(sf_dir):
    """The prefix-filter join must emit EXACTLY the uncapped brute-force
    all-pairs result at J ≥ 1/2 — completeness is the whole claim of
    the SSJoin/PPJoin construction (the capped inverted-index row drops
    hot-bucket pairs by design; this one must not drop anything).  Also
    witnesses the pruning: prefix candidates are a small fraction of
    the pairs sharing any shingle."""
    con = _con(sf_dir)
    docs = con.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    shingles = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        if len(toks) >= 3:
            shingles[doc_id] = {" ".join(toks[i:i + 3])
                                for i in range(len(toks) - 2)}
    # uncapped brute force over the inverted index
    inv = {}
    for d, ss in shingles.items():
        for s in ss:
            inv.setdefault(s, []).append(d)
    sharing = set()
    for ids in inv.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sharing.add((a, b))
    expect = {}
    for a, b in sharing:
        i = len(shingles[a] & shingles[b])
        j = i / (len(shingles[a]) + len(shingles[b]) - i)
        if j >= 0.5:
            expect[(a, b)] = j

    rows = con.sql(CATALOG["dedup_prefix_jaccard"][1]).fetchall()
    got = {(a, b): j for a, b, j in rows}
    assert set(got) == set(expect), (
        set(expect) - set(got), set(got) - set(expect))
    for k in expect:
        assert got[k] == expect[k], (k, got[k], expect[k])

    # the pruning witness: prefix candidates << sharing pairs
    df = {s: len(ids) for s, ids in inv.items()}
    pre = {}
    for d, ss in shingles.items():
        ordered = sorted(ss, key=lambda s: (df[s], s))
        p = len(ordered) - (len(ordered) + 1) // 2 + 1
        pre[d] = set(ordered[:p])
    pinv = {}
    for d, ps in pre.items():
        for s in ps:
            pinv.setdefault(s, []).append(d)
    cand = set()
    for ids in pinv.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = len(shingles[a]), len(shingles[b])
                if max(sa, sb) <= 2 * min(sa, sb):
                    cand.add((a, b))
    assert set(expect) <= cand
    assert len(cand) < 0.2 * len(sharing), (len(cand), len(sharing))


def test_prefix_filter_lemma_random_sets():
    """The prefix-filter lemma itself, engine-free: for random small
    sets under a random global total order, every pair with J ≥ 1/2
    shares a token within the first |x| − ⌈|x|/2⌉ + 1 tokens of BOTH
    sides' global-order-sorted lists."""
    import random

    rng = random.Random(123)
    universe = list(range(40))
    for trial in range(300):
        order = {u: r for r, u in enumerate(
            rng.sample(universe, len(universe)))}
        sets = [frozenset(rng.sample(universe, rng.randint(1, 12)))
                for _ in range(12)]
        for ia in range(len(sets)):
            for ib in range(ia + 1, len(sets)):
                A, B = sets[ia], sets[ib]
                i = len(A & B)
                if i / (len(A) + len(B) - i) < 0.5:
                    continue
                pa = sorted(A, key=order.get)
                pb = sorted(B, key=order.get)
                na = len(pa) - (len(pa) + 1) // 2 + 1
                nb = len(pb) - (len(pb) + 1) // 2 + 1
                assert set(pa[:na]) & set(pb[:nb]), (
                    trial, sorted(A), sorted(B))
