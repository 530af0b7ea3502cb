"""Continuous training-data ingest: the curation funnel as a stream sink.

Batch-mode curation (:mod:`..operators.pipeline`) answers "what do I
append today" for one batch; a continuous ingest asks the same question
per micro-batch, with the crucial twist that *earlier micro-batches are
part of the corpus later ones dedup against*.  :class:`CurationSink`
closes that loop with the persisted :class:`..operators.dedup_index.
MinHashIndex`:

    sink = CurationSink(index_path, out_path)
    q = (docs_stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

Per micro-batch: load the index -> run the funnel (quality / lang /
exact / intra-batch near-dup / corpus near-dup) -> one parallel wave
writes accepted rows AND appends them to every store, so the NEXT
micro-batch sees them.

Delivery semantics (the part worth being precise about):

- **Output is exactly-once.** Accepted rows land under
  ``out_path/ingest_batch=<id>/`` (hive-partitioned further by
  (lang, split) inside), written with overwrite - a replayed micro-batch
  (foreachBatch is at-least-once after a failure) rewrites its own
  directory instead of double-appending.
- **Every store is exactly-once too (round 13).** The MinHash index
  joined the other six disk-backed stores' discipline: ``add_batch``
  OVERWRITES this batch's own ``batch=<id>`` partitions (replays
  duplicate nothing - pre-round-13 appends grew the index on every
  replay), and the probe loads with ``exclude_batch=batch_id`` so a
  replayed micro-batch dedups against the corpus AS OF ITS
  PREDECESSORS.  The exclusion makes replay determinism STRUCTURAL:
  previously it rested on the invariant that the appended set equals
  the accepted set (internally near-dup-free, so a replay's kept rows
  could only self-match, which the id check excludes) - an argument a
  partially-failed append or any future id-rewriting stage would
  silently void.  Pinned by tests/test_streaming_curate.py's
  replay-with-intra-batch-dups test.

The streaming-vs-batch equivalence test (tests/test_streaming_curate.py)
pins the contract: feeding micro-batches through the sink in order
accepts exactly the rows the batch-mode ``curate_annotated`` +
``add_batch`` loop accepts, and a replayed micro-batch changes nothing.

Reference provenance: the reference's streaming surface is the
poll-loop listener registry (`CacheListenerRegistry.scala:85-94`); the
curation sink is part of the LLM-pipeline closure, reusing the same
foreachBatch shape as :class:`.watch.ListenerHub`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup_index import MinHashIndex
from ..operators.pipeline import curate_annotated, curation_funnel


class _CachedStore:
    """Per-store handle cache for the sink's read side (round-13 floor
    work): the meta row, the healed base file listing, and per-batch
    partition reads appended since - so a steady-state micro-batch
    loads its three probe handles with ZERO Spark jobs and zero
    re-listing.

    The replay discipline is preserved by caching the UNDERLYING
    tables, never an exclusion view: ``view(name, exclude)`` assembles
    the as-of-predecessors frame per batch from

    - ``base``: one ``spark.read`` per table taken when the cache was
      built (file listing frozen - immutable for committed partitions),
      filtered to drop the excluded id AND every id in ``parts`` (a
      partition overwritten since the cache was built supersedes the
      frozen listing's view of it; without that filter a replayed
      overwrite would leave base pointing at deleted files), then
    - unioned with the ``parts`` reads (one per batch this sink
      appended), skipping the excluded id.

    Invalidation: ``refresh_part`` after every append (the overwrite
    makes the old per-batch read stale); the whole cache entry is
    dropped before any compaction (the fold reshapes partitions, and a
    crashed fold must be healed by the rebuild's ``recover_tables``).

    Explicit schemas throughout: an empty partition (accepted-empty
    batch under partitionBy) has no parquet footer to infer."""

    def __init__(self, spark, path: str, schemas_fn):
        from ..fsutil import recover_tables

        self.spark = spark
        self.path = path
        # meta first (it never participates in a swap): some stores'
        # table schemas depend on it (the MinHash index's id_type)
        self.meta = spark.read.parquet(f"{path}/meta").collect()[0]
        self.schemas = dict(schemas_fn(self.meta))
        # heal any interrupted compaction swap BEFORE freezing listings
        recover_tables(spark, path, tuple(self.schemas))
        self.base = {
            name: spark.read.schema(f"{schema}, batch int").parquet(
                f"{path}/{name}")
            for name, schema in self.schemas.items()
        }
        from ..fsutil import list_batch_ids

        # partition ids present when the listing was frozen (one FS
        # glob per table) - consumers use these to decide whether a
        # per-batch exclusion can ever have an effect
        self.base_ids = {
            name: list_batch_ids(spark, f"{path}/{name}")
            for name in self.schemas
        }
        self.parts: dict[int, dict[str, DataFrame]] = {}
        # store-specific per-batch scalars (e.g. the NgramLM V /
        # gram-row counts precomputed for the NEXT batch id - a replay
        # of an earlier id misses and recounts with its own exclusion)
        self.stats: dict = {}

    def refresh_part(self, batch_id: int) -> None:
        self.parts[int(batch_id)] = {
            name: self.spark.read.schema(schema).parquet(
                f"{self.path}/{name}/batch={int(batch_id)}")
            for name, schema in self.schemas.items()
        }

    def view(self, name: str, exclude: int | None) -> DataFrame:
        skip = set(self.parts)
        if exclude is not None:
            skip.add(int(exclude))
        v = self.base[name]
        if skip:
            v = v.filter(~F.col("batch").isin(sorted(skip)))
        v = v.drop("batch")
        for b, tabs in self.parts.items():
            if exclude is not None and int(b) == int(exclude):
                continue
            v = v.unionByName(tabs[name])
        return v


class CurationSink:
    """foreachBatch target: curate each micro-batch against the stored
    MinHash index, write accepted rows, grow the index.

    ``index_path`` must hold a saved :class:`MinHashIndex` (build it
    once from the existing corpus - or from a seed batch for a
    from-scratch ingest; an index needs at least one document so the
    stored tables carry a schema).  ``curate_kwargs`` pass through to
    :func:`curate_annotated` (min_quality, langs, drop_repetitive,
    max_pii, near_dup_threshold, split_fractions, split_salt).

    ``benchmarks_path``: a parquet (id, text) evaluation set; every
    micro-batch then runs the funnel's ``contaminated`` stage against
    it (exact 13-gram collision, benchmark grams broadcast) - "never
    train on eval data" enforced continuously at ingest, not as a
    post-hoc sweep over the accepted corpus.  The set is read once and
    cached for the sink's lifetime.

    ``blocklist_path`` / ``allowlist_path``: parquet domain lists
    (single ``domain`` string column, registrable domains); every
    micro-batch then runs the funnel's stage-0 ``blocked_domain``
    origin gate against them (broadcast left joins - see
    :mod:`..operators.domains`), with ``url_col`` passed through
    ``curate_kwargs`` when the stream carries a real URL column
    (without it the gate keys on the deterministic synthetic URL from
    ``source``).  The lists are read once and cached for the sink's
    lifetime, the ``benchmarks_path`` posture.

    ``ledger=True``: persist each batch's funnel counts under
    ``out_path/_funnel_ledger/ingest_batch=<id>/`` with the same
    overwrite-per-batch exactly-once discipline as the accepted output
    - replays rewrite their own entry, and unlike the in-memory
    ``funnel_totals`` the accounting survives driver restarts (read it
    back with :func:`funnel_ledger`).  The underscore prefix keeps the
    ledger out of ``accepted_dataset``'s data glob.  ``funnel_totals`` sums stage counts
    across micro-batches on the driver (the observability hook, not a
    data path); counts are keyed per batch_id internally, so a replayed
    micro-batch REPLACES its own entry instead of double-counting - the
    totals stay one-count-per-ingested-row under at-least-once
    delivery (within this sink instance; a driver restart starts the
    accounting fresh, as any in-process metric does).

    ``seen_bloom_path``: maintain a :class:`..operators.bloom.BloomIndex`
    over the CONTENT HASHES of every accepted document, and run each
    micro-batch through the funnel's ``seen_before`` stage against it -
    cross-RUN exact dedup that the MinHash index also provides, but at
    a sketch's cost (the filter is ~1.2 GB per 10^9 docs at the default
    1% fpp vs the index's full shingle sets; at that scale the filter
    still broadcasts or shuffle-hashes cheaply).  The first batch seeds
    the filter (size it via ``bloom_expected_items`` for the corpus
    LIFETIME - a Bloom filter saturates, it never resizes); every batch
    then probes the filter AS OF ITS PREDECESSORS (the load excludes
    the current batch id's word partition) and overwrites its own
    ``words/batch=<id>/`` partition with its accepted content's words -
    O(batch) work, and exactly-once under replay: a replayed
    micro-batch neither sees its own first attempt's contribution
    (which would make it reject its own rows) nor double-appends.
    ``compact_every`` folds committed batch partitions into one
    ``batch=-1`` history partition BEFORE the next batch runs, which
    is the ordering that keeps the replay-exclusion argument intact.

    ``clf_path``: a saved :class:`..operators.classifier.QualityClassifier`
    directory; the sink loads it ONCE and runs the funnel's
    ``clf_low_quality`` stage every micro-batch (pass ``min_clf_score``
    through ``curate_kwargs`` - the funnel raises without it).  The
    model is static (fit-once), so unlike ``lm_path`` there is no
    accumulation; callers that already hold a fitted object can pass
    ``clf=`` directly instead.

    ``langid_path``: a saved :class:`..operators.langid.LangIdModel`
    directory; the sink loads it ONCE and every micro-batch's ``lang``
    annotation becomes the model's prediction (plus ``lang_conf``),
    with the funnel's ``wrong_language`` gate active when
    ``min_lang_conf`` rides ``curate_kwargs`` — CCNet step 0 enforced
    at ingest.  Static like ``clf_path`` (NB counts would admit
    accumulation, but a langid model is fit on trusted per-language
    reference corpora, not on the ingest stream — growing it from its
    own predictions would be self-training drift).

    ``lm_path``: maintain an incremental :class:`..operators.lm.NgramLM`
    (geometry ``lm_n``/``lm_k``/``lm_digit_bucket``, pinned at init)
    and run each micro-batch through the funnel's ``ppl_out_of_band``
    stage against it - pass the band (``max_ppl`` and/or ``min_ppl``)
    through ``curate_kwargs`` or the funnel refuses.  The model is
    loaded AS OF THE BATCH'S PREDECESSORS (``exclude_batch``) and, with
    ``lm_accumulate`` (default), grown with each batch's ACCEPTED
    documents via overwrite-per-batch count partitions - the same
    exactly-once replay discipline as the Bloom filter, and no corpus
    refit ever.  A just-init'd empty model scores every scorable doc
    ppl == 1: seed it (``NgramLM.init`` + ``append_batch`` over a
    trusted corpus) before trusting a tight band.  ``compact_every``
    folds committed LM count partitions into history alongside the
    bloom/index compactions.

    ``bm25_path``: maintain an incremental :class:`..operators.retrieval.
    Bm25Index` over every ACCEPTED document — the retrieval surface
    ("find the training documents most relevant to this probe") kept
    current at ingest instead of rebuilt per audit.  Each micro-batch
    overwrites its own ``batch=<id>`` postings/docfreq/stats partitions
    (``append_batch(reload=False)`` — O(batch) work, exactly-once under
    replay, no history re-read; df/tf/stats are distributive over the
    document-disjoint batches the sink produces).  The first batch
    creates the index (``bm25_bucket_partitions`` pins the term-bucket
    fan-out for file-level search pruning); ``compact_every`` folds
    committed batch partitions into history alongside the bloom/LM
    compactions, with the same exclude-in-flight discipline.  Search
    any time with ``Bm25Index.load(spark, bm25_path).topk(...)``.

    ``fingerprint_path``: maintain a :class:`..operators.
    fingerprint_index.FingerprintIndex` (winnowing fingerprints,
    geometry ``fingerprint_k``/``fingerprint_w`` pinned at init) over
    every ACCEPTED document - the cross-run MOSS surface ("is this new
    document substantially copied from the corpus") kept current at
    ingest, same overwrite-per-batch exactly-once discipline and
    ``compact_every`` folding as the bm25/bloom/LM paths.  Probe any
    time with ``FingerprintIndex.load(spark, path).match_batch(...)``;
    the funnel's own near-dup gates stay MinHash-based (bag
    similarity) - the fingerprint index answers the position-local
    verbatim question those gates don't.

    ``bpe_hist_path``: maintain a :class:`..operators.bpe.WordHistogram`
    (the word-type histogram - the sufficient statistic for BPE
    training, folding convention ``bpe_hist_lowercase`` pinned at
    init) over every ACCEPTED document: each micro-batch overwrites
    its own ``counts/batch=<id>`` partition (word counts are
    distributive over the sink's document-disjoint batches), same
    exactly-once replay discipline and ``compact_every`` folding as
    the bloom/LM/bm25 paths.  Re-derive a tokenizer that reflects the
    curated distribution at any time with ``WordHistogram.load(spark,
    path).train(...)`` - no accepted-history re-scan, ever.

    ``commonness_path``: maintain a
    :class:`..operators.commonness.CommonnessIndex` (content-
    fingerprint counts - the streaming SoftDedup state) over every
    ACCEPTED document, same overwrite-per-batch / replay-exclusion /
    ``compact_every`` discipline; fingerprint convention
    (``commonness_hash_fn``, ``commonness_normalize``) pinned at
    init.  Price any batch against accumulated history at export
    time with ``CommonnessIndex.load(spark, path).weights(...)`` -
    duplicates accepted N times decay exactly as the one-shot
    soft_dedup_weights would on the union corpus.

    ``compact_every``: every N index-growing micro-batches, fold the
    index's band/shingle batch partitions (:meth:`MinHashIndex.compact`
    / ``compact_tiered`` per ``compact_mode``) AND coalesce the
    accepted dataset's committed ``ingest_batch=<id>/`` directories
    into the oldest id (:meth:`compact_accepted`).  add_batch writes
    one partition dir per batch and the sink one output dir; at the
    engine's 500 ms
    reference trigger cadence an uncompacted ingest accretes ~7k
    files/hour/table and ~7k dirs/hour - the classic streaming
    small-files decay, where directory LISTING becomes the read
    bottleneck after a month.  Compaction runs between batches on the
    sink's own thread, which is exactly the non-concurrent window the
    swap needs.  It is maintenance, not semantics: probes return
    identical links, and ``accepted_dataset`` returns identical data
    rows, before and after (pinned by test).

    ``compact_mode``: how the BATCH-PARTITIONED stores (bloom / LM /
    bm25 / fingerprint / bpe-hist / commonness) fold at each
    ``compact_every`` cadence.  ``"full"`` (default) rewrites the
    whole accumulated history - O(history) per cadence, the term the
    round-10 growth campaign measured at 111 -> 176 s over 5M docs.
    ``"tiered"`` runs each store's ``compact_tiered``: only the
    batches appended since the last fold are read and written (one new
    negative LEVEL partition; existing levels move through the swap as
    verbatim renames), so the cadence cost is bounded by recent
    appends - flat - with the full merge deferred until
    ``compact_max_levels`` levels accrete (each store falls back
    internally).  Same exclude-in-flight replay discipline either way;
    crash-recoverable via the fsutil marker protocol (gated by
    tests/test_tiered_compact.py).  As of round 13 the MinHashIndex
    folds with the same cadence and mode as the other stores (its
    batch-partitioned band/shingle tables concatenate distributively,
    so tiered levels read exactly like batches - and the shingle table
    is the CORPUS-scale store where O(recent) folding matters most);
    only the accepted dataset keeps its full-replacement compactor
    (its fold rewrites the (lang, split) layout by construction)."""

    def __init__(self, index_path: str, out_path: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 compact_every: int | None = None,
                 compact_target_mb: int = 256,
                 compact_mode: str = "full",
                 compact_max_levels: int = 8,
                 benchmarks_path: str | None = None,
                 blocklist_path: str | None = None,
                 allowlist_path: str | None = None,
                 ledger: bool = False,
                 seen_bloom_path: str | None = None,
                 bloom_expected_items: int = 1_000_000,
                 bloom_fpp: float = 0.01,
                 lm_path: str | None = None,
                 lm_accumulate: bool = True,
                 lm_n: int = 3, lm_k: float = 0.1,
                 lm_digit_bucket: bool = False,
                 clf_path: str | None = None,
                 langid_path: str | None = None,
                 bm25_path: str | None = None,
                 bm25_bucket_partitions: int = 1024,
                 fingerprint_path: str | None = None,
                 fingerprint_k: int = 5, fingerprint_w: int = 4,
                 fingerprint_bucket_partitions: int = 256,
                 bpe_hist_path: str | None = None,
                 bpe_hist_lowercase: bool = False,
                 commonness_path: str | None = None,
                 commonness_hash_fn: str = "xxhash64",
                 commonness_normalize: bool = True,
                 **curate_kwargs):
        if lm_path is not None and "lm" in curate_kwargs:
            raise ValueError(
                "pass either lm_path (sink-maintained incremental model) "
                "or lm= (caller-owned fitted model), not both"
            )
        if clf_path is not None and "clf" in curate_kwargs:
            raise ValueError(
                "pass either clf_path (saved QualityClassifier, loaded "
                "once) or clf= (caller-owned fitted model), not both"
            )
        if langid_path is not None and "langid" in curate_kwargs:
            raise ValueError(
                "pass either langid_path (saved LangIdModel, loaded "
                "once) or langid= (caller-owned fitted model), not both"
            )
        if compact_mode not in ("full", "tiered"):
            raise ValueError(
                f"compact_mode must be 'full' or 'tiered', got "
                f"{compact_mode!r}"
            )
        self.index_path = index_path
        self.out_path = out_path
        self.text_col = text_col
        self.id_col = id_col
        self.compact_every = compact_every
        self.compact_target_mb = compact_target_mb
        self.compact_mode = compact_mode
        self.compact_max_levels = compact_max_levels
        self.benchmarks_path = benchmarks_path
        self.blocklist_path = blocklist_path
        self.allowlist_path = allowlist_path
        self.ledger = ledger
        self.seen_bloom_path = seen_bloom_path
        self.bloom_expected_items = bloom_expected_items
        self.bloom_fpp = bloom_fpp
        self.lm_path = lm_path
        self.lm_accumulate = lm_accumulate
        self.lm_n = lm_n
        self.lm_k = lm_k
        self.lm_digit_bucket = lm_digit_bucket
        self.clf_path = clf_path
        self.langid_path = langid_path
        self.bm25_path = bm25_path
        self.bm25_bucket_partitions = bm25_bucket_partitions
        self.fingerprint_path = fingerprint_path
        self.fingerprint_k = fingerprint_k
        self.fingerprint_w = fingerprint_w
        self.fingerprint_bucket_partitions = fingerprint_bucket_partitions
        self.bpe_hist_path = bpe_hist_path
        self.bpe_hist_lowercase = bpe_hist_lowercase
        self.commonness_path = commonness_path
        self.commonness_hash_fn = commonness_hash_fn
        self.commonness_normalize = commonness_normalize
        self.curate_kwargs = curate_kwargs
        self._clf = None
        self._langid = None
        self._blocklist: DataFrame | None = None
        self._allowlist: DataFrame | None = None
        self.funnel_by_batch: dict[int, dict[str, int]] = {}
        self._adds = 0
        self._bench: DataFrame | None = None
        # read-side handle caches (index / bloom / lm), keyed by store;
        # see _CachedStore - dropped before any compaction, parts
        # refreshed after every append
        self._store_cache: dict[str, _CachedStore] = {}
        # per-batch phase walls (seconds), appended by __call__ - the
        # observability hook the floor work measures against; one small
        # dict per batch, no Spark cost
        self.phase_log: list[dict] = []

    @staticmethod
    def _path_exists(spark, path: str) -> bool:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf).exists(p)

    @property
    def funnel_totals(self) -> dict[str, int]:
        totals: dict[str, int] = {}
        for counts in self.funnel_by_batch.values():
            for stage, n in counts.items():
                totals[stage] = totals.get(stage, 0) + n
        return totals

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        _t0 = _time.perf_counter()
        _ph: dict = {"batch_id": batch_id}

        def _mark(name: str, since: float) -> float:
            now = _time.perf_counter()
            _ph[name] = round(now - since, 3)
            return now

        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        _t = _mark("guard_s", _t0)

        def run_compact(handle, *full_args, cache_key: str | None = None
                        ) -> None:
            # the compact_every maintenance fold, in the configured
            # mode: "tiered" folds only the batches appended since the
            # last fold into a new negative level (O(recent) write
            # cost; falls back to the full merge once
            # compact_max_levels accrete - each store's
            # compact_tiered handles that internally), "full" rewrites
            # the whole history every cadence.  Either way the
            # in-flight batch stays hideable (exclude_batch), so the
            # replay-exclusion argument is intact.
            #
            # the handle cache drops BEFORE the fold: the fold
            # reshapes partitions, and if it crashes mid-swap the
            # rebuild's recover_tables heals it before re-freezing
            # listings
            if cache_key is not None:
                self._store_cache.pop(cache_key, None)
            if self.compact_mode == "tiered":
                # full_args (the Bloom handle's compact_target_mb)
                # forward to the tiered fallback's full merge too -
                # without this a non-default target was silently
                # ignored in tiered mode
                handle.compact_tiered(*full_args, exclude_batch=batch_id,
                                      max_levels=self.compact_max_levels)
            else:
                handle.compact(*full_args, exclude_batch=batch_id)
        if self.benchmarks_path is not None and self._bench is None:
            # static eval set: read once, cache across micro-batches -
            # every batch pays one broadcast gram join, never a re-read
            self._bench = spark.read.parquet(self.benchmarks_path).cache()
        if self.blocklist_path is not None and self._blocklist is None:
            # static domain lists, same read-once posture: every batch
            # then pays one broadcast left join per list (the funnel's
            # stage-0 blocked_domain gate - see operators.domains)
            self._blocklist = spark.read.parquet(
                self.blocklist_path).cache()
        if self.allowlist_path is not None and self._allowlist is None:
            self._allowlist = spark.read.parquet(
                self.allowlist_path).cache()
        if (self.compact_every and self._adds
                and self._adds % self.compact_every == 0):
            # MinHash index + accepted-output folds, in the same
            # pre-batch + exclude-in-flight position as the other
            # stores below (pre-round-13 these ran post-append; the
            # batch-partitioned index layout lets them share the
            # uniform discipline - a failed attempt's batch=<id>
            # partitions stay hideable through the fold)
            run_compact(MinHashIndex.load(spark, self.index_path),
                        self.compact_target_mb, cache_key="index")
            self.compact_accepted(spark, before_batch=batch_id)
        if self.seen_bloom_path is not None:
            from ..operators.bloom import BloomIndex

            if not self._path_exists(spark, f"{self.seen_bloom_path}/meta"):
                BloomIndex.init(
                    spark, self.seen_bloom_path,
                    expected_items=self.bloom_expected_items,
                    fpp=self.bloom_fpp,
                )
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                # BEFORE the batch, and with this batch's partition
                # explicitly excluded: a failed first attempt of batch
                # N may already have appended words/batch=N without the
                # streaming commit, and the `_adds` counter (volatile,
                # bumped pre-commit) can re-trigger compaction on the
                # replay - folding that uncommitted partition into
                # history would defeat exclude_batch and make the
                # replay reject its own rows (see BloomIndex.compact)
                run_compact(BloomIndex.load(spark, self.seen_bloom_path),
                            self.compact_target_mb, cache_key="bloom")
        lm_kwargs = {}
        lm = None
        if self.lm_path is not None:
            from ..operators.lm import NgramLM

            if not self._path_exists(spark, f"{self.lm_path}/meta"):
                NgramLM.init(spark, self.lm_path, n=self.lm_n,
                             k=self.lm_k,
                             digit_bucket=self.lm_digit_bucket)
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                # same pre-batch + exclude-in-flight discipline as the
                # bloom compaction above
                run_compact(NgramLM.load(spark, self.lm_path), cache_key="lm")
        if self.bm25_path is not None:
            from ..operators.retrieval import Bm25Index

            if not self._path_exists(spark, f"{self.bm25_path}/meta"):
                Bm25Index.init(
                    spark, self.bm25_path,
                    bucket_partitions=self.bm25_bucket_partitions,
                )
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                # same pre-batch + exclude-in-flight discipline as the
                # bloom/LM compactions above: a failed first attempt of
                # this batch may have written batch=<id> partitions that
                # must stay hideable through the compaction
                run_compact(Bm25Index.load(spark, self.bm25_path))
        if self.fingerprint_path is not None:
            from ..operators.fingerprint_index import FingerprintIndex

            if not self._path_exists(spark,
                                     f"{self.fingerprint_path}/meta"):
                FingerprintIndex.init(
                    spark, self.fingerprint_path,
                    k=self.fingerprint_k, w=self.fingerprint_w,
                    bucket_partitions=self.fingerprint_bucket_partitions,
                )
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                run_compact(FingerprintIndex.load(
                    spark, self.fingerprint_path))
        if self.bpe_hist_path is not None:
            from ..operators.bpe import WordHistogram

            if not self._path_exists(spark, f"{self.bpe_hist_path}/meta"):
                WordHistogram.init(spark, self.bpe_hist_path,
                                   lowercase=self.bpe_hist_lowercase)
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                # same pre-batch + exclude-in-flight discipline as the
                # bloom/LM/bm25/fingerprint compactions above
                run_compact(WordHistogram.load(spark, self.bpe_hist_path))
        if self.commonness_path is not None:
            from ..operators.commonness import CommonnessIndex

            if not self._path_exists(spark, f"{self.commonness_path}/meta"):
                CommonnessIndex.init(
                    spark, self.commonness_path,
                    hash_fn=self.commonness_hash_fn,
                    normalize=self.commonness_normalize)
            elif (self.compact_every and self._adds
                    and self._adds % self.compact_every == 0):
                run_compact(CommonnessIndex.load(spark,
                                                 self.commonness_path))
        clf_kwargs = {}
        if self.clf_path is not None:
            if self._clf is None:
                # static model like the benchmark set: load once, reuse
                # for the sink's lifetime (the classifier is fit-once;
                # unlike the LM there is nothing to accumulate)
                from ..operators.classifier import QualityClassifier

                self._clf = QualityClassifier.load(spark, self.clf_path)
            clf_kwargs["clf"] = self._clf
        if self.langid_path is not None:
            if self._langid is None:
                # static model, load-once (see class doc: accumulation
                # would be self-training drift)
                from ..operators.langid import LangIdModel

                self._langid = LangIdModel.load(spark, self.langid_path)
            clf_kwargs["langid"] = self._langid
        # ---- cached load phase (round-13): each read-side handle is
        # assembled from the sink's _CachedStore (meta + frozen base
        # listing + per-batch partition reads), always AS OF THIS
        # BATCH'S PREDECESSORS via view(..., exclude=batch_id) - the
        # replay discipline lives in the per-batch view assembly, never
        # in a cached exclusion view.  Steady state costs ZERO Spark
        # jobs here except an NgramLM stats recount on a cache miss
        # (first batch, post-compaction rebuild, or an out-of-sequence
        # replay id); the loads still run on driver threads so any
        # miss recount overlaps.  All cadence compactions ran ABOVE,
        # serially (each drops its store's cache entry first), so no
        # cached listing can race a swap.
        def _load_index():
            c = self._store_cache.get("index")
            if c is None:
                c = _CachedStore(spark, self.index_path, lambda m: {
                    "bands": f"id {m['id_type']}, bucket string, band int",
                    "shingles": f"id {m['id_type']}, sh array<string>",
                })
                self._store_cache["index"] = c
            m = c.meta
            params = {"n": int(m["n"]),
                      "num_hashes": int(m["num_hashes"]),
                      "bands": int(m["bands"]), "hash_fn": m["hash_fn"]}
            bands = c.view("bands", batch_id).select(
                "id", F.col("band").cast("int").alias("band"), "bucket")
            return MinHashIndex(bands, c.view("shingles", batch_id),
                                params, path=self.index_path)

        def _load_bloom():
            from ..operators.bloom import BloomIndex

            c = self._store_cache.get("bloom")
            if c is None:
                c = _CachedStore(spark, self.seen_bloom_path,
                                 lambda m: {"words": "word long, bits long"})
                self._store_cache["bloom"] = c
            words = (
                c.view("words", batch_id)
                .groupBy("word")
                .agg(F.expr("bit_or(bits)").alias("bits"))
            )
            return BloomIndex(words, int(c.meta["m"]), int(c.meta["k"]),
                              int(c.meta["seed"]),
                              path=self.seen_bloom_path)

        def _load_lm():
            from ..operators.lm import NgramLM

            # score against the model as of this batch's PREDECESSORS
            # (a replayed batch must not see its own failed attempt's
            # counts).  An empty just-init'd model scores every
            # scorable doc ppl == 1 (V=1 uniform): seed the model
            # before trusting the band, or set min_ppl <= 1 while it
            # warms up.
            c = self._store_cache.get("lm")
            if c is None:
                c = _CachedStore(spark, self.lm_path, lambda m: {
                    "grams": "ctx string, tok string, cnt long",
                    "contexts": "ctx string, total long",
                    "vocab": "tok string",
                })
                self._store_cache["lm"] = c
            grams = c.view("grams", batch_id).groupBy("ctx", "tok").agg(
                F.sum("cnt").alias("cnt"))
            contexts = c.view("contexts", batch_id).groupBy("ctx").agg(
                F.sum("total").alias("total"))
            vocab = c.view("vocab", batch_id).distinct()
            # V and gram_rows must be as-of-predecessors EXACTLY (V is
            # in the smoothing denominator - a stale count changes ppl
            # verdicts).  The post-append phase precomputes them for
            # the next batch id; any other id (replay, restart,
            # static model) recounts against its own exclusion view.
            if ((c.stats.get("for_batch") == batch_id
                 and batch_id not in c.base_ids["grams"])
                    or c.stats.get("static")):
                # the precompute ran over view(exclude=None); it is
                # only valid when excluding THIS id hides nothing the
                # precompute saw - parts cannot hold this id yet, so
                # only a frozen-base partition (a restart reusing ids
                # over an old store) can disqualify it
                v_size, gram_rows = c.stats["V"], c.stats["gram_rows"]
            else:
                v_size, gram_rows = max(vocab.count(), 1), grams.count()
                if (not self.lm_accumulate
                        and not any(i >= 0 for i in c.base_ids["grams"])):
                    # nothing is ever appended AND no positive
                    # partition exists for an exclusion to hide: the
                    # counts are constant for the sink's lifetime
                    c.stats = {"static": True, "V": v_size,
                               "gram_rows": gram_rows}
            lm = NgramLM(grams, contexts, int(c.meta["n"]),
                         float(c.meta["k"]), v_size, gram_rows,
                         path=self.lm_path,
                         digit_bucket=bool(c.meta["digit_bucket"]))
            lm._vocab_df = vocab
            return lm

        from concurrent.futures import ThreadPoolExecutor

        _t = _mark("setup_s", _t)
        loads = {"index": _load_index}
        if self.seen_bloom_path is not None:
            loads["bloom"] = _load_bloom
        if self.lm_path is not None:
            loads["lm"] = _load_lm
        with ThreadPoolExecutor(max_workers=len(loads)) as pool:
            futs = {k: pool.submit(fn) for k, fn in loads.items()}
            handles = {k: f.result() for k, f in futs.items()}
        index = handles["index"]
        bloom = handles.get("bloom")
        lm = handles.get("lm")
        if lm is not None:
            lm_kwargs["lm"] = lm
        _t = _mark("load_s", _t)

        domain_kwargs = {}
        if self._blocklist is not None:
            domain_kwargs["blocked_domains"] = self._blocklist
        if self._allowlist is not None:
            domain_kwargs["allowed_domains"] = self._allowlist
        substrate: dict = {}
        funnel_marks: dict = {}
        annotated = curate_annotated(
            batch_df, index=index,
            text_col=self.text_col, id_col=self.id_col,
            benchmarks=self._bench,
            seen=bloom,
            substrate=substrate,
            timings=funnel_marks,
            **domain_kwargs,
            **lm_kwargs,
            **clf_kwargs,
            **self.curate_kwargs,
        ).localCheckpoint()
        # The attribution checkpoint STAYS (round-14 measured dead
        # end: dropping it let each of the ~8 concurrent append jobs
        # rebuild the attribution joins - the per-job broadcast builds
        # and plan re-analysis under scheduler contention moved the
        # append wave 2.2 -> 4.2 s, swamping the ~1 s the dropped
        # checkpoint saved.  One cheap materialization that every
        # consumer scans is the right trade at micro-batch scale.)
        _t = _mark("funnel_s", _t)
        # the funnel's internal blocking points (what remains of
        # funnel_s is plan build + the attribution ckpt + the
        # concurrent-probe drain)
        _ph.update(funnel_marks)
        accepted = annotated.filter(F.col("reject_reason").isNull()).drop(
            "reject_reason"
        )
        # ---- parallel append phase: the accepted-output write and
        # every store append are independent O(batch) jobs over the
        # CHECKPOINTED annotated frame, each writing to its own path
        # with the overwrite-per-batch exactly-once discipline - so
        # they (and the funnel accounting read) run concurrently on
        # driver threads and the phase costs max(write, appends)
        # instead of their sum (round-14: the output write joined the
        # wave; it was a serialized predecessor before).  All appends
        # are write-only (reload=False): the next batch loads fresh
        # with its own exclude_batch anyway.  Failure semantics are
        # unchanged from the sequential form: any subset (including
        # the output dir) may have landed when the batch fails, and
        # the replay overwrites every store's own partition AND its
        # own ingest_batch dir - at-least-once delivery never exposes
        # a half-written batch to the exclusion views.
        # the funnel's checkpointed shingle substrate, narrowed to the
        # accepted ids: add_batch then skips its own explode+checkpoint
        # job (one fewer serialized job on the micro-batch floor).  The
        # semi-join is lazy over the already-checkpointed frame, and
        # the substrate is built at the INDEX's n by construction.
        def _write_accepted():
            (
                accepted.write.mode("overwrite")
                .partitionBy("lang", "split")
                .parquet(f"{self.out_path}/ingest_batch={batch_id}")
            )

        exp_kept = substrate.get("exploded_kept")
        exploded_accepted = (
            exp_kept.join(
                accepted.select(F.col(self.id_col).alias("id")),
                "id", "left_semi",
            )
            if exp_kept is not None else None
        )

        def _add_index():
            # overwrite-per-batch (round-13 layout): a replay rewrites
            # its own batch=<id> partitions, duplicating nothing
            index.add_batch(
                accepted.select(self.id_col, self.text_col),
                text_col=self.text_col, id_col=self.id_col, reload=False,
                batch_id=batch_id,
                exploded=exploded_accepted,
            )

        def _add_bloom():
            bloom.append_content(accepted, batch_id, self.text_col)

        def _add_lm():
            # grow the reference LM with this batch's ACCEPTED docs -
            # the model converges on the curated distribution without
            # ever refitting over the corpus
            lm.append_batch(
                accepted.select(self.id_col, self.text_col),
                batch_id, self.text_col, reload=False,
            )

        def _add_bm25():
            from ..operators.retrieval import Bm25Index

            Bm25Index.load(spark, self.bm25_path).append_batch(
                accepted.select(self.id_col, self.text_col), batch_id,
                text_col=self.text_col, id_col=self.id_col,
                reload=False,
            )

        def _add_fingerprint():
            from ..operators.fingerprint_index import FingerprintIndex

            FingerprintIndex.load(
                spark, self.fingerprint_path
            ).append_batch(
                accepted.select(self.id_col, self.text_col), batch_id,
                text_col=self.text_col, id_col=self.id_col,
                reload=False,
            )

        def _add_bpe_hist():
            from ..operators.bpe import WordHistogram

            WordHistogram.load(spark, self.bpe_hist_path).append_batch(
                accepted.select(self.text_col), batch_id,
                text_col=self.text_col, reload=False,
            )

        def _add_commonness():
            from ..operators.commonness import CommonnessIndex

            CommonnessIndex.load(spark, self.commonness_path).append_batch(
                accepted.select(self.text_col), batch_id,
                text_col=self.text_col, reload=False,
            )

        def _funnel_counts():
            return {
                row["stage"]: row["rows"]
                for row in curation_funnel(annotated).collect()
            }

        appends = [_write_accepted, _add_index]
        if bloom is not None:
            appends.append(_add_bloom)
        if lm is not None and self.lm_accumulate:
            appends.append(_add_lm)
        if self.bm25_path is not None:
            appends.append(_add_bm25)
        if self.fingerprint_path is not None:
            appends.append(_add_fingerprint)
        if self.bpe_hist_path is not None:
            appends.append(_add_bpe_hist)
        if self.commonness_path is not None:
            appends.append(_add_commonness)
        with ThreadPoolExecutor(max_workers=len(appends) + 1) as pool:
            futs = [pool.submit(fn) for fn in appends]
            counts_fut = pool.submit(_funnel_counts)
            for f in futs:
                f.result()  # re-raise the first append failure
            # the appends are durable at this point: bump the cadence
            # counter BEFORE draining the accounting future (a failure
            # in the accounting step must still leave _adds bumped so
            # the replay's pre-batch compactions exercise the
            # exclude-in-flight discipline).  All cadence folds -
            # including the MinHash index's, as of round 13 - run in
            # the pre-batch block at the TOP of __call__.
            self._adds += 1
            # refresh the cached per-batch partition reads over what
            # was just (durably) written, and precompute the NgramLM
            # V/gram-row counts the NEXT batch id will need - two
            # model-sized jobs that overlap the funnel-accounting
            # drain instead of sitting on the next batch's load path
            stats_fut = None
            idxc = self._store_cache.get("index")
            if idxc is not None:
                idxc.refresh_part(batch_id)
            bloomc = self._store_cache.get("bloom")
            if bloomc is not None and bloom is not None:
                bloomc.refresh_part(batch_id)
            lmc = self._store_cache.get("lm")
            if lmc is not None and lm is not None and self.lm_accumulate:
                lmc.refresh_part(batch_id)

                def _precompute_lm_stats(c=lmc):
                    vocab = c.view("vocab", None).distinct()
                    grams = c.view("grams", None).groupBy("ctx", "tok").agg(
                        F.sum("cnt").alias("cnt"))
                    c.stats = {"for_batch": batch_id + 1,
                               "V": max(vocab.count(), 1),
                               "gram_rows": grams.count()}

                stats_fut = pool.submit(_precompute_lm_stats)
            counts = counts_fut.result()
            if stats_fut is not None:
                stats_fut.result()
        _t = _mark("append_s", _t)
        _ph["total_s"] = round(_time.perf_counter() - _t0, 3)
        self.phase_log.append(_ph)
        self.funnel_by_batch[batch_id] = counts
        if self.ledger:
            # durable accounting: one overwrite-dir per batch, same
            # exactly-once discipline as the accepted output - a replay
            # REWRITES its batch's rows, so the ledger never
            # double-counts and survives driver restarts (unlike the
            # in-memory funnel_totals)
            spark.createDataFrame(
                [(stage, n) for stage, n in sorted(counts.items())],
                "stage string, rows long",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{self.out_path}/_funnel_ledger/ingest_batch={batch_id}"
            )

    def compact_accepted(self, spark, before_batch: int) -> int:
        """Coalesce committed ``ingest_batch=<id>`` dirs (id <
        ``before_batch``) into the oldest such id; returns how many dirs
        were merged (0 = nothing to do).

        Replay safety: foreachBatch only ever replays the batch whose
        commit is not yet in the streaming checkpoint - by the time
        batch N runs, every id < N is durably committed and can never be
        rewritten, so merging them cannot collide with a replay (the
        current batch's dir is deliberately excluded).  The merged rows
        keep their data columns and (lang, split) partitions bit-for-bit;
        the ``ingest_batch`` partition value becomes the oldest merged id
        - after compaction it reads as "ingested at or after", a
        provenance floor, which is the price of bounding dir count.
        The swap (write sibling, delete sources, rename) is the same
        discipline as :meth:`MinHashIndex.compact` and equally
        non-atomic: run it from the sink's own thread between batches
        (which ``compact_every`` does), never concurrently with readers.
        """
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        glob = jvm.org.apache.hadoop.fs.Path(f"{self.out_path}/ingest_batch=*")
        fs = glob.getFileSystem(conf)
        ids = []
        for status in fs.globStatus(glob) or []:
            name = status.getPath().getName()
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if bid < before_batch:
                ids.append(bid)
        if len(ids) < 2:
            return 0
        dest = min(ids)
        srcs = [f"{self.out_path}/ingest_batch={i}" for i in sorted(ids)]
        df = spark.read.option("basePath", self.out_path).parquet(*srcs).drop(
            "ingest_batch"
        )
        total_bytes = sum(
            fs.getContentSummary(jvm.org.apache.hadoop.fs.Path(p)).getLength()
            for p in srcs
        )
        nparts = max(1, -(-total_bytes // (self.compact_target_mb << 20)))
        tmp = f"{self.out_path}/__compacting_accepted"
        (
            df.repartition(int(nparts), "lang", "split")
            .write.mode("overwrite")
            .partitionBy("lang", "split")
            .parquet(tmp)
        )
        for p in srcs:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
        hdest = jvm.org.apache.hadoop.fs.Path(
            f"{self.out_path}/ingest_batch={dest}"
        )
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hdest):
            raise IOError(
                f"compact_accepted: rename {tmp} -> {hdest} failed"
            )
        return len(ids)


def funnel_ledger(spark, out_path: str) -> DataFrame:
    """(ingest_batch, stage, rows) - the durable per-batch funnel
    accounting a ``CurationSink(ledger=True)`` wrote.  Exactly-once by
    construction (each batch overwrites its own dir), so
    ``SUM(rows) GROUP BY stage`` equals the in-memory
    ``funnel_totals`` of an uninterrupted run and stays correct across
    driver restarts and replays."""
    jvm = spark.sparkContext._jvm
    base = f"{out_path}/_funnel_ledger"
    glob = jvm.org.apache.hadoop.fs.Path(f"{base}/ingest_batch=*")
    fs = glob.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.globStatus(glob):
        raise FileNotFoundError(
            f"no funnel ledger under {out_path!r} (construct the sink "
            "with ledger=True)"
        )
    return spark.read.option("basePath", base).parquet(
        f"{base}/ingest_batch=*"
    )


def accepted_dataset(spark, out_path: str) -> DataFrame:
    """Read everything the sink has accepted so far (all ingest batches,
    hive-partitioned by ingest_batch/lang/split).  Raises
    ``FileNotFoundError`` with a clear message when no micro-batch has
    committed yet - an empty frame would need a schema no batch has
    established.  The no-batches-yet case is detected by globbing the
    output directory through the Hadoop FS API (works for any scheme
    the session can read), not by parsing Spark exception text - error
    class names are not stable across Spark versions."""
    jvm = spark.sparkContext._jvm
    glob = jvm.org.apache.hadoop.fs.Path(f"{out_path}/ingest_batch=*")
    fs = glob.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.globStatus(glob):
        raise FileNotFoundError(
            f"no accepted micro-batches under {out_path!r} yet "
            "(the sink writes ingest_batch=<id>/ on its first "
            "non-empty batch)"
        )
    return spark.read.option("basePath", out_path).parquet(
        f"{out_path}/ingest_batch=*"
    )
