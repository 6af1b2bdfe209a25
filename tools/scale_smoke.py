#!/usr/bin/env python
"""Scale smoke: empirical scaling exponents for the scale-path operators.

The sf0.1 bench corpus (5k docs / 2k vectors) verifies correctness but
cannot distinguish a linearithmic operator from a quadratic one — fixed
scheduling overhead dominates. This harness generates a 20-40x corpus in
/tmp (100k docs, 50k embeddings, same schemas as TESTDATA.md), times each
scale-tier operator at n and n/2, and reports the empirical exponent
log2(t_n / t_half). An exponent near 1 means the operator's cost is
dominated by linear work; near 2 means a quadratic term has taken over and
the operator would NOT survive a 100 TB corpus. Exact-by-design tiers
(cosine all-pairs, uncut n-gram join) are deliberately absent — their
contract is quadratic; this tool guards the tiers whose contract is NOT.

Usage::

    python tools/scale_smoke.py [--docs 100000] [--vecs 50000]

Prints one JSON line: {"op": {"t_full": s, "t_half": s, "exp": e}, ...}.
Exponents are noisy at these sizes (JIT, GC, scheduling); the guard is
"well under 2", not a precise slope.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 10k synthetic words: with a tiny vocab every pair of random docs shares
# many shingles (ambient Jaccard ~0.1), which makes every banding scheme
# look quadratic for corpus-statistics reasons, not operator reasons. A
# realistic vocab keeps random-pair similarity ≈ 0 so the smoke measures
# the operators, not the generator.
VOCAB = [f"w{i:04d}" for i in range(10_000)]


class _SkipOp(Exception):
    """Control-flow marker: an op excluded by --only whose FIXTURE
    generation is expensive enough to skip too (the WARC archive pair)."""


def gen_documents(path: str, n: int, seed: int = 7) -> None:
    """Word-soup docs, ~120 words each, with planted near-dup groups
    (every 40th doc is a copy of its predecessor with one word changed)
    mirroring the testdata generator's shape."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    lens = rng.integers(60, 180, size=n)
    texts: list[str] = []
    for i in range(n):
        ws = rng.integers(0, len(VOCAB), size=lens[i])
        if i % 40 == 39 and texts:  # planted near-dup of predecessor
            prev = texts[-1].split()
            prev[rng.integers(0, len(prev))] = VOCAB[int(ws[0])]
            texts.append(" ".join(prev))
        else:
            texts.append(" ".join(VOCAB[j] for j in ws))
    tab = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{i % 5}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tab, path)


def gen_embeddings(path: str, n: int, dim: int = 64, seed: int = 11) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # planted near-dups: every 25th vector is a tiny perturbation of its
    # predecessor (cos > 0.99)
    for i in range(1, n, 25):
        m[i] = m[i - 1] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(tab, path)


def _ensure_smoke_warcs(work: str, n_docs: int = 80_000) -> tuple[str, str]:
    """Deterministic per-record-gzip WARC pair (full = n_docs records,
    half = the same stream stopped at n_docs/2), generated once. Built
    from fixtures/warcgen.py like bench.py's archive, but sized for an
    exponent pair rather than a throughput headline."""
    import gzip
    import io

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fixtures import warcgen as wg

    full = os.path.join(work, f"warc_{n_docs}.warc.gz")
    half = os.path.join(work, f"warc_{n_docs // 2}.warc.gz")
    if os.path.exists(full) and os.path.exists(half):
        return full, half
    tmp_f, tmp_h = full + ".part", half + ".part"
    with open(tmp_f, "wb") as ff, open(tmp_h, "wb") as fh:
        for i in range(n_docs):
            body = (
                "<html><body>"
                + f"<h1>Doc {i}</h1>"
                + "".join(
                    f"<p>Para {j}: " + "tok " * (20 + (i + j) % 7) + "</p>"
                    for j in range(5)
                )
                + "</body></html>"
            ).encode()
            rec = wg.response_record(
                f"https://smoke.example/{i}", body,
                rec_id=f"<urn:uuid:s{i}>",
                date=f"2026-03-{1 + i % 28:02d}T00:00:00Z",
            )
            buf = io.BytesIO()
            with gzip.GzipFile(
                fileobj=buf, mode="wb", mtime=0, compresslevel=1
            ) as gz:
                gz.write(rec)
            member = buf.getvalue()
            ff.write(member)
            if i < n_docs // 2:
                fh.write(member)
    os.replace(tmp_f, full)
    os.replace(tmp_h, half)
    return full, half


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--vecs", type=int, default=50_000)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated op names to re-measure solo (a full-suite "
        "recording can carry one contention-skewed pair; re-run the "
        "flagged op alone and splice the clean numbers)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    work = "/tmp/scale_smoke"
    os.makedirs(work, exist_ok=True)
    docs_p = os.path.join(work, f"documents_{args.docs}.parquet")
    vecs_p = os.path.join(work, f"embeddings_{args.vecs}.parquet")
    if not os.path.exists(docs_p):
        gen_documents(docs_p, args.docs)
    if not os.path.exists(vecs_p):
        gen_embeddings(vecs_p, args.vecs)

    from pyspark.sql import functions as F

    from pcap_converter_spark.functions.text import ccnet_normalize_t
    from pcap_converter_spark.operators import (
        dedup,
        incremental,
        lm,
        packing,
        quality,
        semdedup,
    )
    from pcap_converter_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    def load(path: str, frac: float, plant_period: int):
        """Half-size sampling is BLOCK sampling aligned to the planted-dup
        period (id % 2P < P), not even-ids: the planted near-dup pairs are
        (i, i-1) — one odd, one even — so an even-id sample would carry
        essentially zero planted pairs and the two timed points would
        differ in workload composition, not just size (ADVICE r3)."""
        df = spark.read.parquet(path)
        if frac < 1.0:
            df = df.filter(
                F.col(df.columns[0]) % (2 * plant_period) < plant_period
            )
        p = spark.sparkContext.defaultParallelism
        return df.repartition(p)

    pending: list = []  # operators append internal persists here

    def _cleanup() -> None:
        """Untimed cleanup between measurements (same rationale as
        bench.py): cached blocks and heap debt from one op otherwise land
        as GC pauses inside the next op's timing and swing the measured
        exponent. ONE implementation shared by both timers (r15 review)."""
        for h in pending:
            h.unpersist()
        pending.clear()
        import gc as _gc

        _gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        _cleanup()
        return dt

    docs_full = load(docs_p, 1.0, 40).persist()
    docs_half = load(docs_p, 0.5, 40).persist()
    vecs_full = load(vecs_p, 1.0, 25).persist()
    vecs_half = load(vecs_p, 0.5, 25).persist()
    for d in (docs_full, docs_half, vecs_full, vecs_half):
        d.count()

    # warm the pandas-UDF worker pool before any timed run: the first
    # Arrow stage forks 32 interpreters (~3 s), which would otherwise land
    # inside whichever half-size run hits the pool first and invert the
    # measured exponent
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    p = spark.sparkContext.defaultParallelism
    spark.range(p * 10, numPartitions=p).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    did = F.col("doc_id")

    _incr_paths: dict[int, str] = {}

    def _incr_index_for(d):
        """At-rest index over the even half of ``d``, built once per frame
        and OUTSIDE the timers (mk() evaluates before run()'s clock): the
        write is the one-time cost of having an index; the probe is the
        recurring cost the exponent guards."""
        key = id(d)
        if key not in _incr_paths:
            import tempfile

            p = tempfile.mkdtemp(prefix="smoke_cidx_")
            incremental.write_corpus_index(d.filter(did % 2 == 0), p)
            _incr_paths[key] = p
        return _incr_paths[key]

    def _mk_incr(d):
        p = _incr_index_for(d)
        return lambda: incremental.flag_against_index(
            d.filter(did % 2 == 1), p, handles=pending
        )

    ops = {
        "exact_dedup": lambda d: lambda: dedup.exact_duplicates(d),
        "passage_dedup": lambda d: lambda: dedup.passage_duplicates(
            d, passage_words=8
        ),
        "decontaminate": lambda d: lambda: dedup.decontaminate(
            d.filter(did % 83 != 0), d.filter(did % 83 == 0), k=5
        ),
        "jaccard_dfcut": lambda d: lambda: dedup.ngram_jaccard_pairs(
            d, threshold=0.7, max_shingle_df=8, handles=pending
        ),
        "minhash_lsh": lambda d: lambda: dedup.minhash_lsh_pairs(
            d, threshold=0.7, handles=pending
        ),
        "simhash": lambda d: lambda: dedup.simhash_pairs(
            d, max_hamming=3, n_blocks=8, handles=pending
        ),
        "packing": lambda d: lambda: packing.pack_documents(
            d.select("doc_id", F.size(F.split("text", " ")).alias("nt")), "nt"
        ),
        # the full-corpus-sized shuffle is the gram table (16-byte rows);
        # only duplicated grams survive to the join and rebuild
        "substring_dedup": lambda d: lambda: dedup.remove_duplicate_spans(
            d, min_words=8
        ),
        # C4 line-rule cleaning (r12): map-only by construction, so the
        # cost is linear-in-rows over a LARGE fixed floor — at this
        # corpus size the floor dominates and the recorded exponent sits
        # ~0.5 (see SCALE_SMOKE.json); the guard, as everywhere in this
        # harness, is "well under 2". The reshape gives every page
        # punctuation-cycling 12-word lines so each rule actually fires
        "c4_clean": lambda d: lambda: quality.c4_line_clean(
            d.selectExpr(
                "doc_id",
                "array_join(transform(sequence(0, 9), j -> concat("
                "array_join(slice(split(text, ' '), j * 12 + 1, 12), ' '),"
                " element_at(array('.', '!', '', '?'),"
                " cast(j % 4 + 1 as int)))), '\\n') AS text",
            ),
        ),
        # CCNet digest normalization (r12 second pass): map-only like
        # c4_clean — fixed-floor-dominated exponent expected; the digest
        # keeps the timed plan from collapsing to a no-op projection
        "ccnet_norm": lambda d: lambda: d.select(
            "doc_id",
            F.md5(
                ccnet_normalize_t(F.col("text")).cast("binary")
            ).alias("h"),
        ),
        # line-level boilerplate removal (r9): the word-soup corpus has
        # no newlines, so reshape into 12-word lines + one injected
        # boilerplate line per even doc first (pure SQL, same cost at
        # both sizes per doc) — the exponent guards the doc-frequency
        # agg + broadcast + ordered-rebuild shuffle
        "line_dedup": lambda d: lambda: dedup.line_dedup(
            d.selectExpr(
                "doc_id",
                "concat_ws('\\n', array_join(slice(split(text, ' '), 1, 60),"
                " ' '), CASE WHEN doc_id % 2 = 0 THEN"
                " 'subscribe to our newsletter' ELSE"
                " array_join(slice(split(text, ' '), 61, 60), ' ') END)"
                " AS text",
            ),
            min_docs=3,
        ),
        # the >4M-key FALLBACK branch of the counted gate (VERDICT r10
        # #3: SCALE_SMOKE's line_dedup only ever exercised the broadcast
        # path): broadcast_limit=0 forces the shuffle hash join the
        # operator degrades to on a raw web crawl, so the fallback's
        # scaling is RECORDED, not just output-parity-tested
        "line_dedup_shuffle": lambda d: lambda: dedup.line_dedup(
            d.selectExpr(
                "doc_id",
                "concat_ws('\\n', array_join(slice(split(text, ' '), 1, 60),"
                " ' '), CASE WHEN doc_id % 2 = 0 THEN"
                " 'subscribe to our newsletter' ELSE"
                " array_join(slice(split(text, ' '), 61, 60), ' ') END)"
                " AS text",
            ),
            min_docs=3,
            broadcast_limit=0,
            handles=pending,
        ),
        # train one broadcastable model + score the corpus — both halves
        # are hash-aggregations, so the exponent guards the token explosion
        "lm_filter": lambda d: lambda: lm.perplexity_score(
            d.filter(did % 83 != 0),
            lm.unigram_model(d.filter(did % 83 == 0), vocab_size=5000),
        ),
        # the composed pipeline: its exponent guards the composition's join
        # shapes, not just the individual stages
        "curate": lambda d: lambda: __import__(
            "pcap_converter_spark.operators.pipeline", fromlist=["curate"]
        ).curate(d.filter(did % 83 != 0), d.filter(did % 83 == 0),
                  handles=pending),
        # cross-snapshot probe against the at-rest index: even docs are
        # "yesterday's corpus", odd docs today's snapshot; the exponent
        # guards both probe joins as index AND snapshot double together
        "incremental_probe": _mk_incr,
        # synthetic 3-out-degree link graph over the doc ids: 6 damped
        # power iterations — the exponent guards the per-round join/agg
        # shapes AND the localCheckpoint lineage truncation (an
        # untruncated loop shows super-linear DRIVER time long before
        # executor work grows)
        "pagerank": lambda d: lambda: __import__(
            "pcap_converter_spark.operators.graph", fromlist=["pagerank"]
        ).pagerank(
            d.selectExpr("doc_id AS src", "(doc_id * 7 + 1) % 1000 AS dst")
            .unionByName(
                d.selectExpr("doc_id AS src", "(doc_id * 13 + 5) % 1000 AS dst")
            )
            .unionByName(
                d.selectExpr("doc_id AS src", "(doc_id + 1) % 1000 AS dst")
            ),
            iters=6,
            handles=pending,
        ),
        # sparse lexical retrieval: the (doc,term,tf) table filters to the
        # query's literal terms before anything corpus-sized moves — the
        # exponent guards that the per-query cost tracks the token
        # explosion (linear), not some corpus-wide join
        "bm25": lambda d: lambda: __import__(
            "pcap_converter_spark.operators.tfidf", fromlist=["bm25_topk"]
        ).bm25_topk(
            d, "w0012 w0345 w4567 w7890", k=10, handles=pending
        ),
    }
    from pcap_converter_spark.operators import similarity as _sim

    _smoke_cents = _sim.fixed_centroids(64, 16, seed=42)
    _ivf_paths: dict[int, str] = {}

    def _ivf_index_for(v):
        """Materialized IVF index per frame, built once OUTSIDE the
        timers (mk() evaluates before run()'s clock — the _incr_index_for
        pattern): the batch probe's production shape reads the
        cluster-partitioned index, it does not re-assign the corpus per
        query batch."""
        key = id(v)
        if key not in _ivf_paths:
            import tempfile

            p = tempfile.mkdtemp(prefix="smoke_ivf_")
            _sim.ivf_write(v, _smoke_cents, p)
            _ivf_paths[key] = p
        return _ivf_paths[key]

    def _mk_batch(v):
        p = _ivf_index_for(v)
        spark_ = v.sparkSession
        return lambda: _sim.ivf_topk_batch(
            v.filter(F.col("vec_id") < 25).withColumnRenamed(
                "vec_id", "query_id"
            ),
            spark_.read.parquet(p),
            _smoke_cents,
            k=10,
            nprobe=4,
            assign_corpus=False,
        )

    vec_ops = {
        "embed_lsh": lambda v: lambda: dedup.embedding_neardup_lsh(
            v, threshold=0.9, handles=pending
        ),
        # batch ANN against the MATERIALIZED index: a FIXED 25 queries in
        # one job (ids 0..24 survive the block-aligned half sample, so
        # both points carry the same query load); the exponent guards the
        # exploded-query broadcast join staying output-bound
        # (|Q|·nprobe/C of the corpus), not corpus × corpus
        "ivf_topk_batch": _mk_batch,
        # auto-sized k (∝ n / target): the within-cluster quadratic term
        # is held at n·target total — a fixed k would show exp → 2 here
        "semdedup": lambda v: lambda: semdedup.semantic_dedup(
            v, threshold=0.9, target_cluster_rows=512
        ),
    }

    def run_action(fn) -> float:
        """Time a callable that performs its OWN actions (the ingest hook
        sinks internally); the shared untimed cleanup follows."""
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        _cleanup()
        return dt

    out: dict[str, dict] = {}

    def measure(name: str, mk, half_df, full_df, action: bool = False) -> None:
        if only is not None and name not in only:
            return
        timed = run_action if action else run
        # untimed per-op warmup at half size: the op's first execution
        # compiles its generated code and faults in its worker-side paths;
        # without this the half-size point (always timed first) absorbs
        # that fixed cost and the measured exponent skews NEGATIVE —
        # visible once the block-aligned sampler made half/full carry the
        # same planted-dup density (the even-id sampler's dup-free half
        # corpus happened to mask it)
        timed(mk(half_df))
        # min-of-2 per point: a single pair is hostage to one GC pause —
        # measured r5: a stray passage_dedup full-size run hit 3.8 s
        # (exp 1.85, a false QUADRATIC flag) where three repeats gave
        # 1.07-1.12 s (exp 0.19-0.49). The min is the engine's cost.
        t_half = min(timed(mk(half_df)), timed(mk(half_df)))
        t_full = min(timed(mk(full_df)), timed(mk(full_df)))
        out[name] = {
            "t_half": round(t_half, 2),
            "t_full": round(t_full, 2),
            "exp": round(
                (0 if t_half <= 0 else __import__("math").log2(t_full / t_half)), 2
            ),
        }
        print(f"scale_smoke: {name} half={t_half:.1f}s full={t_full:.1f}s "
              f"exp={out[name]['exp']}", file=sys.stderr)

    for name, mk in ops.items():
        measure(name, mk, docs_half, docs_full)
    for name, mk in vec_ops.items():
        measure(name, mk, vecs_half, vecs_full)

    # streaming ingest hook (VERDICT r14 stretch #7): the production
    # write path's PER-BATCH cost — exactly the foreachBatch body
    # (probe against the at-rest index → in-batch exact collapse →
    # sink), timed as a direct call so the exponent measures the hook,
    # not streaming-engine startup. Unlike incremental_probe (index AND
    # snapshot double together), the index here is FIXED (built once
    # over the full corpus's even half, untimed) and only the drained
    # batch doubles — the drain-N-vs-2N-files question: probe cost
    # should track batch size (~linear), the index side of the join
    # staying a constant read. update=False keeps the measurement
    # idempotent (an append would grow the index between repeats and
    # the min-of-2 points would time different indexes).
    def _mk_ingest(d):
        from pcap_converter_spark.streaming.ingest import dedup_ingest_hook

        p = _incr_index_for(docs_full)  # ONE fixed index for both points
        hook = dedup_ingest_hook(
            p,
            sink=lambda df, bid: df.write.format("noop")
            .mode("overwrite").save(),
            update=False,
        )
        batch = d.filter(did % 2 == 1)
        return lambda: hook(batch, 0)

    measure("ingest_hook", _mk_ingest, docs_half, docs_full, action=True)

    # the fused WARC→documents source (r8 surface): exponent over ARCHIVE
    # BYTES rather than row count — the reader's unit of scale is the
    # chunk-indexed gzip member stream. Half = the same generator stopped
    # at half the records, so both points carry identical per-record work.
    try:
        from pcap_converter_spark.sources.warc import warc_documents

        if only is not None and "warc_documents" not in only:
            raise _SkipOp  # don't generate the 80k-record archive pair
            # for a solo re-run of some other op (the --only workflow)
        wfull, whalf = _ensure_smoke_warcs(work)

        def _mk_warc(path):
            sz = os.path.getsize(path)
            tgt = max(256 << 10, sz // 64)
            return lambda: warc_documents(
                spark, path, target_chunk_bytes=tgt
            )

        measure("warc_documents", _mk_warc, whalf, wfull)
    except _SkipOp:
        pass
    except Exception as exc:  # pragma: no cover - smoke resilience
        print(f"scale_smoke: warc_documents skipped: {exc}", file=sys.stderr)

    # media feature extractors (VERDICT r15 #6): the new modality
    # operators carry the same N-vs-2N evidence as the text/vector
    # tiers. All three are per-payload mapInPandas decodes — the
    # expected shape is exp ≈ 1 (embarrassingly parallel, no shuffle);
    # anything approaching 2 would mean a cross-payload term crept in.
    try:
        if only is not None and not {
            "image_features", "audio_features", "video_features_at_paths"
        } & only:
            raise _SkipOp
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from pcap_converter_spark.operators import multimodal as _mm

        def _media_fixture(kind: str, n: int, gen_row) -> str:
            p = os.path.join(work, f"smoke_{kind}_{n}.parquet")
            if not os.path.exists(p):
                _pq.write_table(
                    _pa.table({
                        "doc_id": _pa.array(range(n), type=_pa.int64()),
                        "payload": _pa.array(
                            [gen_row(i) for i in range(n)],
                            type=_pa.binary(),
                        ),
                    }),
                    p,
                )
            return p

        mrng = _np.random.default_rng(3)

        def _bmp_row(i: int) -> bytes:
            h, w = 48 + (i % 5) * 8, 48 + (i % 7) * 8
            return _mm.encode_bmp(
                mrng.integers(0, 256, (h, w, 3), dtype=_np.uint8)
            )

        _aud_t = _np.arange(8000) / 8000.0

        def _wav_row(i: int) -> bytes:
            tone = 0.4 * _np.sin(2 * _np.pi * (100 + (i % 37) * 13) * _aud_t)
            noise = 0.1 * mrng.standard_normal(8000)
            return _mm.encode_wav(tone + noise, 8000)

        n_img, n_aud, n_vid = 2000, 2000, 400
        img_p = _media_fixture("images", n_img, _bmp_row)
        aud_p = _media_fixture("audio", n_aud, _wav_row)

        # video face reads PATHS (GB clips stay off the payload column):
        # n_vid y4m files on disk + a paths DataFrame
        vid_dir = os.path.join(work, f"smoke_videos_{n_vid}")
        if not os.path.isdir(vid_dir):
            os.makedirs(vid_dir, exist_ok=True)
            for i in range(n_vid):
                frames = [
                    mrng.integers(0, 256, (24, 32), dtype=_np.uint8)
                    for _ in range(8)
                ]
                with open(os.path.join(vid_dir, f"c{i:05d}.y4m"), "wb") as f:
                    f.write(_mm.encode_y4m(frames, fps=6))

        par = spark.sparkContext.defaultParallelism
        img_full = spark.read.parquet(img_p).repartition(par).persist()
        img_half = img_full.filter(did % 2 == 0).persist()
        aud_full = spark.read.parquet(aud_p).repartition(par).persist()
        aud_half = aud_full.filter(did % 2 == 0).persist()
        vid_full = spark.createDataFrame(
            [(i, os.path.join(vid_dir, f"c{i:05d}.y4m"))
             for i in range(n_vid)],
            "doc_id long, path string",
        ).repartition(par).persist()
        vid_half = vid_full.filter(did % 2 == 0).persist()
        for d in (img_full, img_half, aud_full, aud_half, vid_full,
                  vid_half):
            d.count()

        measure(
            "image_features",
            lambda d: lambda: _mm.image_features(d),
            img_half, img_full,
        )
        measure(
            "audio_features",
            lambda d: lambda: _mm.audio_features(d),
            aud_half, aud_full,
        )
        measure(
            "video_features_at_paths",
            lambda d: lambda: _mm.video_features_at_paths(
                d, path_col="path", max_frames=4
            ),
            vid_half, vid_full,
        )
        for d in (img_full, img_half, aud_full, aud_half, vid_full,
                  vid_half):
            d.unpersist()
    except _SkipOp:
        pass
    except Exception as exc:  # pragma: no cover - smoke resilience
        print(f"scale_smoke: media features skipped: {exc}", file=sys.stderr)

    print(json.dumps({"docs": args.docs, "vecs": args.vecs, "ops": out}))
    bad = [k for k, v in out.items() if v["exp"] >= 1.8]
    if bad:
        print(f"scale_smoke: QUADRATIC SUSPECTS: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
