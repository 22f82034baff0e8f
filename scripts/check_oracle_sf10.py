#!/usr/bin/env python3
"""sf10-scale (100x) correctness sweep: run every catalog oracle against
DuckDB over localdata/sf10 and compare with the Spark Verify dump.

At 100x data the DuckDB oracle -- not the engine -- is the bottleneck:
the generated recursive-FNV CTEs retain every (row, char-position)
intermediate and recursive CTEs don't spill (measured ~30 GB at sf1 for
d18; d08's chain alone ran 25 minutes at sf1). The 13 recursion-bearing
entries are therefore replayed with the same mechanical transformation
the sf1 heavy script introduced: the recursive chain is swapped for a
Python UDF that replays the identical xor-multiply recursion, leaving
every other CTE of the generated SQL byte-for-byte intact.

Three UDFs cover all 13 recursion shapes:
  fnv2(s)      -- two multiplies per ASCII char   (shingle/token family)
  fnv1(s)      -- one multiply per ASCII char     (simhash token family)
  fnv_u16(s)   -- two rounds per UTF-16 code unit (lower(text) keys)
plus mink_fp(s), which replays d10's whole per-document pipeline
(k-gram fnv_u16 hashes -> distinct signed -> 8 smallest -> FNV fold).

Gating (--gate): every rewritten oracle is validated 1:1 against the
ORIGINAL generated SQL at sf0.1 before the sf10 run counts. At sf1 the
standard sweep (check_oracle.py) already proves original == Spark, so
the rewrite is additionally compared against the Spark sf1 dump --
rewrite == Spark == original, closing the loop at 10x too.

Results where DuckDB and pandas would need tens of GB (q21 at sf10 is
~30M rows) are compared inside DuckDB: row count + order-insensitive
sum(hash(row)) over identically-typed relations.

Two entries run through oracle_sf1_heavy's out-of-core forms (staged
d18, doc_id-chunked d19) — that script gates each form 1:1 against the
original SQL at sf0.1 whenever it runs.

Usage:
  check_oracle_sf10.py --gate  <verify_sf01_dir> <sf01_dir> <verify_sf1_dir> <sf1_dir> [only,names] [both|sf0.1|sf1]
  check_oracle_sf10.py --run   <verify_sf10_dir> <sf10_dir> [report_json] [only,names]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, json, glob, threading, time
import duckdb
import pandas as pd

MASK = (1 << 64) - 1
PRIME = 1099511628211
BASIS = 14695981039346656037
ENTRY_TIMEOUT = int(os.environ.get("GRAFT_ORACLE_TIMEOUT", "1800"))


def fnv2(s: str) -> int:
    """Two multiplies per char: h = ((h ^ ascii(c)) * p % 2^64) * p % 2^64.
    The ASCII-token/shingle family (tokens are [a-z0-9 ] only)."""
    h = BASIS
    for c in s:
        h = (((h ^ ord(c)) * PRIME) & MASK) * PRIME & MASK
    return h


def fnv1(s: str) -> int:
    """Single multiply per char (the simhash token chain)."""
    h = BASIS
    for c in s:
        h = ((h ^ ord(c)) * PRIME) & MASK
    return h


def fnv_u16(s: str) -> int:
    """Two rounds per UTF-16 code unit: low byte then high byte."""
    h = BASIS
    for c in s:
        cp = ord(c)
        h = ((h ^ (cp & 255)) * PRIME) & MASK
        h = ((h ^ ((cp >> 8) & 255)) * PRIME) & MASK
    return h


def mink_fp(s: str) -> int:
    """d10's whole pipeline on the already-normalized string: fnv_u16
    over every 8-gram (clipped at the string end exactly as the
    recursion's `pos + j <= len` guard does), distinct under SIGNED
    order, 8 smallest, FNV-folded ascending."""
    k, m = 8, 8
    hs = set()
    for pos in range(max(len(s) - k + 1, 1)):
        h = fnv_u16(s[pos:pos + k])
        hs.add(h - (1 << 64) if h >= (1 << 63) else h)
    fp = BASIS
    for v in sorted(hs)[:m]:
        fp = ((fp ^ (v & MASK)) * PRIME) & MASK
    return fp - (1 << 64) if fp >= (1 << 63) else fp


# the validated out-of-core evaluators (staged d18, chunked d19) live in
# the sf1 heavy script; reuse them verbatim rather than re-transcribing
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle_sf1_heavy as heavy  # noqa: E402


def connect(sf_dir, db=None, fresh=True):
    # a disk-backed database lets staged CREATE TABLEs run out-of-core
    # (one-shot queries spill via temp_directory either way, but
    # recursive CTEs and list-agg intermediates do not — see the heavy
    # script's docstring); fresh=False reopens an existing stage db
    # (the per-stage forked evaluator resumes where the last fork left)
    if fresh and db is not None and os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db) if db is not None else duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_ORACLE_MEM", "80GB"))
    con.create_function("fnv2", fnv2, ["VARCHAR"], "UBIGINT")
    con.create_function("fnv1", fnv1, ["VARCHAR"], "UBIGINT")
    con.create_function("fnv_u16", fnv_u16, ["VARCHAR"], "UBIGINT")
    con.create_function("mink_fp", mink_fp, ["VARCHAR"], "BIGINT")
    # d18's staged t_fnv stage names the heavy script's UDF; it computes
    # the identical two-multiply recursion as fnv2
    con.create_function("fnv_d18", fnv2, ["VARCHAR"], "UBIGINT")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{src}'")
    return con


# entries whose ONE-SHOT oracle exceeds RAM even UDF-rewritten (list-agg
# + candidate-sig peaks; recursive per-char d19): evaluated through an
# out-of-core form — d18 via the heavy script's marker-staged evaluator,
# d19 via its doc_id-chunked evaluator (both gated there at sf0.1 on
# every run), the rest via the generic CTE-materializing splitter below
# (gated here by --gate: staged == one-shot original at sf0.1, staged ==
# Spark dump at sf1)
STAGED = {"d18_neardup_clusters"}
GENERIC_STAGED = {"d08_minhash_neardups",
                  # one-shot spill exceeded the 75G scratch volume at sf10
                  "d09_simhash_neardups", "e08_semantic_dedup",
                  "d12_curation", "d17_decontamination"}
CHUNKED = {"d19_gopher_quality"}
CHUNK_STEP = 10_000_000  # ScaleUp replica key offset

import re  # noqa: E402


def split_ctes(sql):
    """Parse a linear top-level `WITH a AS (...), b AS (...) SELECT ...`
    chain into ([(name, colAliases, body)], finalSelect). Paren-depth
    scan with string-literal awareness — the generated oracles are one
    flat WITH chain (any WITH RECURSIVE lives inside a body, where it
    stays)."""
    s = sql.strip()
    assert s[:4].upper() == "WITH", s[:40]
    # the paren scan below understands single-quoted strings ONLY; a
    # generated oracle containing a SQL comment or a double-quoted
    # identifier would be silently mis-split into wrong stage SQL
    # (caught only at --gate time, with a confusing failure) — fail
    # loudly here instead if the grammar ever grows those. Strip
    # single-quoted literal bodies first so a literal like '%--%' or
    # a regexp containing '/*' doesn't trip the guard on valid SQL
    # the scanner handles fine.
    outside = re.sub(r"'(?:[^']|'')*'", "''", s)
    assert ("--" not in outside and "/*" not in outside
            and '"' not in outside), \
        "split_ctes cannot parse comments or quoted identifiers"
    i = 4
    ctes = []
    while True:
        m = re.match(r"\s*(\w+)\s*(\([^)]*\))?\s+AS\s+\(", s[i:])
        assert m, f"expected CTE at ...{s[i:i+80]!r}"
        j = i + m.end()
        depth, k, in_str = 1, j, False
        while depth:
            c = s[k]
            if in_str:
                if c == "'":
                    in_str = False  # '' escapes toggle twice: net no-op
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((m.group(1), m.group(2) or "", s[j:k - 1]))
        m2 = re.match(r"\s*,", s[k:])
        if not m2:
            return ctes, s[k:]
        i = k + m2.end()


def staged_generic(con, sql, log=lambda *a: None):
    """Materialize every top-level CTE as a TABLE in order, then run the
    final SELECT against them. On a disk-backed database each stage runs
    out-of-core and the one-shot plan's live-everything peak never
    forms. Equivalence to the one-shot form is exact by construction
    (same SQL text per stage) and still gated empirically by --gate."""
    import time
    ctes, final = split_ctes(sql)
    for name, cols, body in ctes:
        t0 = time.time()
        con.execute(f"DROP TABLE IF EXISTS {name}")
        alias = f" AS _s{cols}" if cols else ""
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM ({body})" + alias)
        n = con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
        log(f"  stage {name}: {n} rows in {time.time() - t0:.1f}s")
    return con.execute(final).fetchdf()


def d09_sliced(con, sql, log=lambda *a: None):
    """d09 with the pair stage evaluated in (band x chunk-quarter)
    slices: the one-shot `pairs` CTE materializes a DISTINCT over every
    per-bucket candidate pair (~billions of rows at sf10) before the
    hamming filter prunes them. Pushing the hamming predicate INSIDE
    each slice commutes with the DISTINCT (hamming is a function of the
    pair, and each doc has exactly one fingerprint), so slicing + a
    global pandas dedup is row-identical to the original final."""
    import time
    ctes, final = split_ctes(sql)
    bodies = {n: b for n, _, b in ctes}
    for name, cols, body in ctes:
        if name == "pairs":
            break
        t0 = time.time()
        con.execute(f"DROP TABLE IF EXISTS {name}")
        alias = f" AS _s{cols}" if cols else ""
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM ({body})" + alias)
        n = con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
        log(f"  stage {name}: {n} rows in {time.time() - t0:.1f}s")
    pb = bodies["pairs"]
    assert pb.rstrip().endswith("WHERE a.doc_id < c.doc_id"), pb[-80:]
    # Derive the slicing constants from the SQL itself so a change to
    # OracleSql.simhashNearDups (bands / chunk width / hamming budget)
    # cannot silently drop candidate pairs here: the `banded` CTE names
    # the band fan-out and the per-band bit shift, the final SELECT the
    # hamming threshold.
    bb = bodies["banded"]
    m = re.search(r"unnest\(range\(0, (\d+)\)\)", bb)
    assert m, f"banded CTE lost its range() fan-out: {bb[-120:]}"
    n_bands = int(m.group(1))
    m = re.search(r"band\*(\d+)", bb.replace(" ", ""))
    assert m, f"banded CTE lost its band*bits shift: {bb[-120:]}"
    chunk_domain = 1 << int(m.group(1))
    m = re.search(r"bit_count\(xor\(fa, fb\)\) <= (\d+)", final)
    assert m, f"final SELECT lost its hamming filter: {final[-120:]}"
    max_hamming = int(m.group(1))
    assert chunk_domain % 4 == 0, chunk_domain
    quarter = chunk_domain // 4
    frames = []
    for band in range(n_bands):
        for q in range(4):
            lo, hi = q * quarter, (q + 1) * quarter
            sliced = (pb + f" AND a.band = {band}"
                      f" AND a.chunk >= {lo} AND a.chunk < {hi}"
                      f" AND bit_count(xor(a.f, c.f)) <= {max_hamming}")
            t0 = time.time()
            frames.append(con.execute(
                "SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INTEGER)"
                f" AS hamming FROM ({sliced}) t").fetchdf())
            log(f"  slice band={band} chunk=[{lo},{hi}): "
                f"{len(frames[-1])} rows in {time.time() - t0:.1f}s")
    out = pd.concat(frames, ignore_index=True).drop_duplicates()
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def _stage_child(sf_dir, db, stmts):
    con = connect(sf_dir, db=db, fresh=False)
    for stmt in stmts:
        con.execute(stmt)
    con.close()


# stages whose hash-aggregate builds per-group ordered-list state for
# EVERY group at once (DuckDB reserves ~256KB of sort state per group:
# 500k docs -> >80GB however high the limit) — built in doc_id-range
# chunks instead; the range predicate pushes below the GROUP BY (plan-
# verified), so each chunk aggregates only its own groups
CHUNKED_STAGES = {"sig", "t_sig"}


def _doc_chunks(sf_dir):
    con = connect(sf_dir)
    hi = con.execute("SELECT MAX(doc_id) FROM documents").fetchone()[0]
    con.close()
    step = 50_000_000
    return [(lo, min(lo + step, hi + 1))
            for lo in range(0, hi + 1, step)]


def _run_stages_forked(sf_dir, db, stages):
    """Each stage in its own forked process. The 26M-row Python-UDF
    stages leave tens of GB of address-space bloat behind (arrow
    transfer buffers / allocator retention) that then OOMs a LATER
    stage's DuckDB reservation in the same process — observed: d12's
    trivial 16M-row sig aggregation failing at three different memory
    limits right after the fnv stage, while the identical statement
    succeeds instantly in a fresh process on the same stage db. The
    stage tables live in the disk db, so a fresh process per stage
    resets RSS to zero between stages."""
    import multiprocessing as mp
    ctx = mp.get_context("fork")
    if os.path.exists(db):
        os.remove(db)

    def run_child(label, stmts):
        t0 = time.time()
        p = ctx.Process(target=_stage_child, args=(sf_dir, db, stmts))
        p.start()
        p.join()
        if p.exitcode != 0:
            raise RuntimeError(f"stage {label}: child exit {p.exitcode}")
        print(f"  stage {label}: {time.time() - t0:.1f}s (forked)", flush=True)

    for name, select in stages:
        if name in CHUNKED_STAGES:
            for i, (lo, hi) in enumerate(_doc_chunks(sf_dir)):
                verb = (f"CREATE TABLE {name} AS" if i == 0
                        else f"INSERT INTO {name}")
                run_child(f"{name}[{lo},{hi})",
                          [f"{verb} SELECT * FROM ({select}) "
                           f"WHERE doc_id >= {lo} AND doc_id < {hi}"])
        else:
            run_child(name, [f"CREATE TABLE {name} AS {select}"])


def staged_forked(name, sql, sf_dir):
    """staged_generic, but with per-stage process isolation (see
    _run_stages_forked) — the sf10 form for the UDF-heavy entries."""
    db = f"/tmp/sf10_stagefork_{name}.db"
    ctes, final = split_ctes(sql)
    stages = [(n, f"SELECT * FROM ({body})"
               + (f" AS _s{cols}" if cols else ""))
              for n, cols, body in ctes]
    _run_stages_forked(sf_dir, db, stages)
    con = connect(sf_dir, db=db, fresh=False)
    try:
        return con.execute(final).fetchdf()
    finally:
        con.close()


def d18_forked(sql, sf_dir):
    """heavy.d18_staged's exact stage list (same markers over the same
    generated SQL), executed with per-stage forks; the final comp
    recursion runs over the small candidate tables as there."""
    db = "/tmp/sf10_stagefork_d18.db"
    b = lambda s_, e: heavy.cte_body(sql, s_, e)
    stages = [
        ("t_sh", "WITH toksrc(doc_id, t) AS ({}) {}".format(
            b("WITH toksrc(doc_id, t) AS (", "), mixers"),
            b("), sh AS (", "), fnv AS ("))),
        ("t_fnv", "SELECT doc_id, sid, fnv_d18(s) AS h FROM t_sh"),
        ("t_sig", ("WITH mixers(i, ahi, alo, bu) AS ({}), "
                   "fnv AS (SELECT * FROM t_fnv), mixed AS ({}) {}").format(
            b("mixers(i, ahi, alo, bu) AS (", "), sh AS ("),
            b("), mixed AS (", "), sig AS ("),
            b("), sig AS (", "), banded AS ("))),
        ("t_banded", "WITH sig AS (SELECT * FROM t_sig) {}".format(
            b("), banded AS (", "), keep AS ("))),
        ("t_keep", "WITH banded AS (SELECT * FROM t_banded) {}".format(
            b("), keep AS (", "), cand AS ("))),
        ("t_cand", ("WITH banded AS (SELECT * FROM t_banded), "
                    "keep AS (SELECT * FROM t_keep) {}").format(
            b("), cand AS (", "), sets AS ("))),
        ("t_sets", "WITH sh AS (SELECT * FROM t_sh) {}".format(
            b("), sets AS (", "), est AS ("))),
    ]
    _run_stages_forked(sf_dir, db, stages)
    final = ("WITH cand AS (SELECT * FROM t_cand), "
             "sets AS (SELECT * FROM t_sets), est AS ({}), pre AS ({}), "
             "pairs AS ({}), comp AS ( WITH RECURSIVE {} {}").format(
        b("), est AS (", "), pre AS ("),
        b("), pre AS (", "), pairs AS ("),
        b("), pairs AS (", "), comp AS ("),
        b("), comp AS ( WITH RECURSIVE", ") SELECT id AS doc_id"),
        ") SELECT id AS doc_id" + sql[sql.index(") SELECT id AS doc_id")
                                      + len(") SELECT id AS doc_id"):])
    con = connect(sf_dir, db=db, fresh=False)
    try:
        return con.execute(final).fetchdf()
    finally:
        con.close()


def oracle_df(con, name, sql, sf_dir=None):
    """Evaluate the (rewritten) oracle as a DataFrame, via the validated
    out-of-core strategy where the one-shot form exceeds RAM."""
    if name in STAGED:
        if sf_dir is not None:
            return d18_forked(sql, sf_dir)
        return heavy.d18_staged(con, sql, log=lambda m: print(m, flush=True))
    if name == "d09_simhash_neardups":
        return d09_sliced(con, sql, log=lambda m: print(m, flush=True))
    if name in GENERIC_STAGED:
        if sf_dir is not None:
            return staged_forked(name, sql, sf_dir)
        return staged_generic(con, sql, log=lambda m: print(m, flush=True))
    if name in CHUNKED:
        hi = con.execute("SELECT MAX(doc_id) FROM documents").fetchone()[0]
        return heavy.d19_chunked(con, sql, 0, hi + 1, CHUNK_STEP)
    return con.execute(sql).fetchdf()


def rewrite(sql, start, end, repl):
    a = sql.index(start)
    b = sql.index(end, a)
    return sql[:a] + repl + sql[b:]


# entry -> (start_marker, end_marker, replacement) over the generated SQL
REWRITES = {
    "d08_minhash_neardups": ("fnv AS ( WITH RECURSIVE", "), mixed AS (",
        "fnv AS ( SELECT doc_id, sid, fnv2(s) AS h FROM sh"),
    "d12_curation": ("fnv AS ( WITH RECURSIVE", "), mixed AS (",
        "fnv AS ( SELECT doc_id, sid, fnv2(s) AS h FROM sh"),
    "d17_decontamination": ("fnv AS ( WITH RECURSIVE", "), mixed AS (",
        "fnv AS ( SELECT doc_id, sid, fnv2(s) AS h FROM sh"),
    "d18_neardup_clusters": ("fnv AS ( WITH RECURSIVE", "), mixed AS (",
        "fnv AS ( SELECT doc_id, sid, fnv2(s) AS h FROM sh"),
    "d09_simhash_neardups": ("fnv AS ( WITH RECURSIVE", "), votes AS (",
        "fnv AS ( SELECT tok, fnv1(tok) AS h FROM toku"),
    "d25_dsir_importance": ("fnv AS ( WITH RECURSIVE", "), tb AS (",
        "fnv AS ( SELECT tok, CAST(fnv2(tok) % 4096 AS BIGINT) AS bucket FROM toku"),
    "d29_dsir_resample": ("fnv AS ( WITH RECURSIVE", "), tb AS (",
        "fnv AS ( SELECT tok, CAST(fnv2(tok) % 4096 AS BIGINT) AS bucket FROM toku"),
    "d33_nb_classifier": ("fnv AS ( WITH RECURSIVE", "), tb AS (",
        "fnv AS ( SELECT tok, CAST(fnv2(tok) % 4096 AS BIGINT) AS bucket FROM toku"),
    "d30_bigram_crossentropy": ("fnv AS ( WITH RECURSIVE", "), c2 AS (",
        "fnv AS ( SELECT s, CAST(fnv2(s) % 4096 AS BIGINT) AS bucket FROM strs"),
    "d31_repeated_spans": ("fnv AS ( WITH RECURSIVE", "), occ AS (",
        "fnv AS ( SELECT s, fnv2(s) AS h FROM strs"),
    "d32_ngram_contamination": ("fnv AS ( WITH RECURSIVE", "), bhash AS (",
        "fnv AS ( SELECT s, fnv2(s) AS h FROM strs"),
    "d22_bloom_incremental_dedup": ("fnv AS ( WITH RECURSIVE", "), h2c AS (",
        "fnv AS ( SELECT doc_id, fnv_u16(key) AS h1 FROM kl"),
}


# e08's k-means assignment windows over corpus x centroids with the
# 64-float vector as sort PAYLOAD (~90 GB of spill at sf10, past the
# scratch volume). Mechanical projection-split: window over the scalar
# similarity only, re-join dv afterwards -- identical rows by
# construction (vec_id is unique), gated like every other transform.
ASSIGN_RE = re.compile(
    r"(\w+) AS \( SELECT vec_id, dv, cell_id FROM \( SELECT c\.vec_id, "
    r"c\.dv, s\.cell_id, ROW_NUMBER\(\) OVER \(PARTITION BY c\.vec_id "
    r"ORDER BY list_cosine_similarity\(c\.dv, s\.centroid\) DESC, "
    r"s\.cell_id\) AS rn FROM corpus c CROSS JOIN (\w+) s\) "
    r"WHERE rn = 1\)")


def slim_assign(sql):
    def rep(m):
        name, cents = m.group(1), m.group(2)
        return (
            f"{name} AS ( SELECT c2.vec_id, c2.dv, w.cell_id FROM "
            f"( SELECT vec_id, cell_id FROM ( SELECT c.vec_id, s.cell_id, "
            f"ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY "
            f"list_cosine_similarity(c.dv, s.centroid) DESC, s.cell_id) AS rn "
            f"FROM corpus c CROSS JOIN {cents} s) WHERE rn = 1) w "
            f"JOIN corpus c2 ON w.vec_id = c2.vec_id)")
    out, n = ASSIGN_RE.subn(rep, sql)
    assert n >= 1, "e08 assign pattern not found -- generator changed?"
    return out


def rewritten(name, sql):
    if name == "e08_semantic_dedup":
        return slim_assign(sql)
    if name in REWRITES:
        return rewrite(sql, *REWRITES[name])
    if name == "d10_fingerprint_mink":
        # replace everything from the grams recursion on with the
        # per-document UDF; the norm CTE stays byte-identical
        a = sql.index("), nl AS (")
        return sql[:a] + \
            ") SELECT doc_id, mink_fp(s) AS sketch_fp FROM norm ORDER BY doc_id"
    return sql


def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_df(name, mine, orc):
    mine, orc = canon(mine), canon(orc)
    if list(mine.columns) != list(orc.columns):
        return f"columns {list(mine.columns)} vs {list(orc.columns)}"
    if len(mine) != len(orc):
        return f"rows {len(mine)} vs {len(orc)}"
    if [str(t) for t in mine.dtypes] != [str(t) for t in orc.dtypes]:
        return f"dtype {[str(t) for t in mine.dtypes]} vs {[str(t) for t in orc.dtypes]}"
    for c in mine.columns:
        neq = ~(mine[c].eq(orc[c]) | (mine[c].isna() & orc[c].isna()))
        if neq.any():
            i = neq.idxmax()
            return f"{c}[{i}]: {mine[c][i]!r} vs {orc[c][i]!r} (n={neq.sum()})"
    return None


def run_with_timeout(con, fn, seconds):
    timer = threading.Timer(seconds, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        return fn(), time.time() - t0, None
    except Exception as e:
        msg = str(e)
        kind = "TIMEOUT" if "INTERRUPT" in msg.upper() or \
            time.time() - t0 >= seconds - 1 else msg[:300]
        return None, time.time() - t0, kind
    finally:
        timer.cancel()


BIG_ROWS = 10_000_000  # pandas compare above this -> in-DuckDB checksum


def check_entry(con, name, sql, out_dir, sf_dir=None):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        return {"err": "no result dir"}
    mine_rel = f"SELECT * FROM '{res_path}/*.parquet'"
    n_mine = con.execute(f"SELECT COUNT(*) FROM ({mine_rel})").fetchone()[0]
    if n_mine <= BIG_ROWS:
        def fn():
            orc = oracle_df(con, name, sql, sf_dir=sf_dir)
            mine = con.execute(mine_rel).fetchdf()
            return compare_df(name, mine, orc)
        diff, secs, err = run_with_timeout(con, fn, ENTRY_TIMEOUT)
        if err:
            return {"err": err, "secs": round(secs, 1)}
        return {"err": diff, "rows": int(n_mine), "secs": round(secs, 1)}
    # huge result: order-insensitive checksum entirely inside DuckDB.
    # hash() is type-sensitive, so cast both sides through the Spark
    # dump's schema (the smaller-SF sweeps already pin dtypes).
    assert name not in STAGED | GENERIC_STAGED | CHUNKED, \
        f"{name}: staged/chunked oracle cannot take the checksum path"
    def fn():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE {mine_rel}").fetchall()]
        types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {mine_rel}").fetchall()}
        sel = ", ".join(f'CAST("{c}" AS {types[c]}) AS "{c}"' for c in sorted(cols))
        h = ", ".join(f'"{c}"' for c in sorted(cols))
        qm = con.execute(
            f"SELECT COUNT(*), SUM(hash({h})) FROM (SELECT {sel} FROM ({mine_rel}))"
        ).fetchone()
        qo = con.execute(
            f"SELECT COUNT(*), SUM(hash({h})) FROM (SELECT {sel} FROM ({sql}))"
        ).fetchone()
        if qm[0] != qo[0]:
            return f"rows {qm[0]} vs {qo[0]}"
        if qm[1] != qo[1]:
            return f"hashsum {qm[1]} vs {qo[1]}"
        return None
    diff, secs, err = run_with_timeout(con, fn, ENTRY_TIMEOUT)
    if err:
        return {"err": err, "secs": round(secs, 1)}
    return {"err": diff, "rows": int(n_mine), "secs": round(secs, 1),
            "mode": "checksum"}


def gate(v01, sf01, v1, sf1, only=None, phase="both"):
    """Validate every rewrite: vs the ORIGINAL SQL at sf0.1, and vs the
    Spark dump at sf1 (original == Spark at sf1 is the standard sweep's
    result, so rewrite == Spark closes rewrite == original at 10x).

    d18's sf1 half runs through the STAGED form on a disk-backed db —
    its one-shot rewrite OOMs at 10x (list-agg + candidate-sig peaks,
    which don't spill); the staged == original equivalence itself is
    gated at sf0.1 by oracle_sf1_heavy on every run of that script.

    `only` restricts to named entries, `phase` to one sf, so a crashed
    run resumes without repaying the already-passed validations.
    """
    oracle = json.load(open(f"{v01}/oracle_sql.json"))
    gateable = list(REWRITES) + ["d10_fingerprint_mink"] + sorted(
        (STAGED | GENERIC_STAGED | CHUNKED) - set(REWRITES))
    names = [n for n in gateable if not only or n in only]
    ok = True
    if phase in ("both", "sf0.1"):
        con = connect(sf01)
        for name in names:
            orig = con.execute(oracle[name]).fetchdf()
            mine = oracle_df(con, name, rewritten(name, oracle[name]))
            diff = compare_df(name, mine, orig)
            print(f"{'PASS' if not diff else 'FAIL'} gate-sf0.1 {name}"
                  + (f": {diff}" if diff else f" ({len(orig)} rows)"),
                  flush=True)
            ok &= not diff
        con.close()
    if phase in ("both", "sf1"):
        oracle1 = json.load(open(f"{v1}/oracle_sql.json"))
        for name in names:
            con = connect(sf1, db="/tmp/sf10_gate_stage.db"
                          if name in STAGED | GENERIC_STAGED else None)
            mine = oracle_df(con, name, rewritten(name, oracle1[name]))
            spark = con.execute(
                f"SELECT * FROM '{v1}/{name}/*.parquet'").fetchdf()
            diff = compare_df(name, mine, spark)
            print(f"{'PASS' if not diff else 'FAIL'} gate-sf1 {name}"
                  + (f": {diff}" if diff else f" ({len(spark)} rows)"),
                  flush=True)
            ok &= not diff
            con.close()
    return ok


def _child_entry(name, sql, v10, sf10, out_path):
    # own process group: STAGED/GENERIC_STAGED entries fork per-stage
    # grandchildren (_run_stages_forked); on timeout the parent kills
    # the whole group, so no orphan keeps burning memory/disk or holds
    # the stage db while the sweep moves on
    os.setsid()
    con = connect(sf10)
    r = check_entry(con, name, sql, v10, sf_dir=sf10)
    con.close()
    with open(out_path, "w") as f:
        json.dump(r, f)


def check_entry_isolated(name, sql, v10, sf10):
    """One entry per child process: a DuckDB OutOfMemoryException has
    been observed to leave the in-process global allocator unable to
    serve even 8-byte blocks for the NEXT connection (two crashed
    sweeps), so each entry gets a fresh address space and the parent
    just reads the verdict. A kernel OOM-kill of the child is recorded
    as that entry's failure instead of ending the sweep."""
    import multiprocessing as mp
    out_path = f"/tmp/sf10_entry_{os.getpid()}.json"
    if os.path.exists(out_path):
        os.remove(out_path)
    ctx = mp.get_context("fork")  # fork: child inherits loaded module
    p = ctx.Process(target=_child_entry,
                    args=(name, sql, v10, sf10, out_path))
    t0 = time.time()
    p.start()
    p.join(ENTRY_TIMEOUT + 60)
    if p.is_alive():
        # kill the child's whole process group (it called os.setsid):
        # terminate() alone would orphan the per-stage grandchild forks
        import signal
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.terminate()
        p.join()
        return {"err": "TIMEOUT (parent)", "secs": round(time.time() - t0, 1)}
    if not os.path.exists(out_path):
        return {"err": f"child died (exit {p.exitcode})",
                "secs": round(time.time() - t0, 1)}
    with open(out_path) as f:
        return json.load(f)


def run(v10, sf10, report_path, only=None):
    oracle = json.load(open(f"{v10}/oracle_sql.json"))
    report = {}
    if os.path.exists(report_path):
        report = json.load(open(report_path))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if report.get(name, {}).get("err") is None and name in report:
            n_pass += 1
            continue  # already green in a previous partial run
        r = check_entry_isolated(name, rewritten(name, oracle[name]),
                                 v10, sf10)
        report[name] = r
        ok = r.get("err") is None
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({r.get('rows', '?')} rows, {r.get('secs', '?')}s)"
              + ("" if ok else f": {r['err']}"), flush=True)
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
    print(f"\n{n_pass} pass / {n_fail} fail")
    return n_fail == 0


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "--gate":
        only = set(sys.argv[6].split(",")) if len(sys.argv) > 6 else None
        phase = sys.argv[7] if len(sys.argv) > 7 else "both"
        sys.exit(0 if gate(*sys.argv[2:6], only=only, phase=phase) else 1)
    elif mode == "--run":
        only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
        path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/sf10_report.json"
        sys.exit(0 if run(sys.argv[2], sys.argv[3], path, only) else 1)
    else:
        print(__doc__)
        sys.exit(2)
