package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at the given scale factor and
  * prints ONE machine-parsed JSON line.
  *
  * Methodology: two timed passes over the query set, reporting the per-query
  * MINIMUM ("agg":"min_of_2" in the output). Wall-times on a shared box vary
  * ±30% run-to-run (SURVEY §9); the first pass additionally pays one-time
  * JIT/codegen-compile and cache-materialization costs that say nothing
  * about the engine's steady-state throughput. The min is the standard
  * noise-robust estimator for that steady state. warm_sec covers session
  * init + the one-time persist of the shared lineages (runner caching
  * policy, SURVEY §9) and is reported separately, not counted in `value`.
  *
  * Execution convention (round 17, `"exec":"plan"` in the sidecar): each
  * query runs via `queryExecution.toRdd.count()` — its OWN physical plan
  * — because `Dataset.count()` re-optimizes and can prune expensive
  * subtrees whose row count is statically derivable (op_mrr's brute scan
  * vanished under a unique-key left-join elimination; 36 queries showed
  * count-pruned leaves in the CountAudit sweep). Pre-r17 trend entries
  * for that set under-measured; the sidecar field marks the boundary.
  */
object Bench {
  /** Short metric-line aliases for the longest query keys, applied AFTER
    * the "op_" strip. The driver keeps only the last 2000 chars of stdout;
    * at 111 queries the full stripped keys measured 2040 chars (mid-JSON
    * truncation — the r1/r2 unparsed-bench failure). Most aliases are
    * stable from round 6; round 8's five new queries forced fifteen keys
    * shorter (each renames noted in SURVEY §9.2's regenerated table, the
    * cross-round trend key). BenchAliasSpec pins uniqueness, no stale
    * sources, and the worst-case line fit. */
  val alias: Map[String, String] = Map(
    "topk_asc_filtered" -> "tk", "stratified_sample" -> "sf",
    "neardup_survivors" -> "nd", "curation_pipeline" -> "cp",
    "states_exempting" -> "sx", "refund_by_reason" -> "rr",
    "filing_deadlines" -> "fd", "display_truncate" -> "dt",
    "state_quantiles" -> "sq", "state_breakdown" -> "sbk",
    "refund_by_state" -> "rst", "label_centroids" -> "lc",
    "doc_fingerprint" -> "dfp", "video_features" -> "vf",
    "stream_windows" -> "swn", "refund_summary" -> "rf",
    "media_features" -> "mft", "json_roundtrip" -> "jrt",
    "image_features" -> "ift", "hist_quantiles" -> "hqt",
    "filter_project" -> "fpj", "filed_semijoin" -> "fsm",
    "embed_quantize" -> "qz", "effective_rate" -> "eff",
    "dedup_clusters" -> "ddc", "audio_features" -> "aft",
    "contamination" -> "ctm", "dedup_recall" -> "ddr",
    "bigram_score" -> "bgs", "unigram_score" -> "ugs",
    "dedup_exact" -> "ddx", "minhash_pairs" -> "mhp",
    "token_jaccard" -> "jac", "passage_dups" -> "psg",
    "csv_roundtrip" -> "cv", "orc_roundtrip" -> "oc",
    "stream_nexus" -> "snx", "quality_score" -> "ql",
    "text_quality" -> "tq", "token_count" -> "tc",
    "subword_count" -> "sw", "hash_sample" -> "hsm",
    "split_assign" -> "spl", "kmv_distinct" -> "kmv",
    "embed_neardup" -> "enr", "topk_per_key" -> "tkk",
    "window_rank" -> "wr", "events_window" -> "evw",
    "rates_listing" -> "rl", "refund_claims" -> "rfc",
    "refund_scan" -> "rfsc", "refund_report" -> "rrp",
    "claims_nested" -> "clm", "nexus_check" -> "nx",
    "tax_report" -> "txr", "tax_summary" -> "txs",
    "case_bucket" -> "cbk", "unknown_state" -> "us",
    "incl_backout" -> "bko", "txn_details" -> "tdt",
    "text_report" -> "ttr", "sort_duedate" -> "due",
    "para_dedup" -> "padd", "sql_surface" -> "sql",
    "stream_dedup" -> "sdd", "top_ngrams" -> "ngr",
    "stream_sessions" -> "ss", "compact_latest" -> "cpt",
    "boilerplate" -> "bl", "shard_shuffle" -> "shd",
    "zscore" -> "zsc", "zorder" -> "zord", "winnow" -> "ww",
    "gopher_rules" -> "goph", "vocab_coverage" -> "vc",
    "hard_negatives" -> "hn", "embed_norm" -> "en",
    "cms_topk" -> "cms", "seq_pack" -> "pack", "tax_calc" -> "txc",
    "lang_id" -> "lid", "lsh_ann" -> "lsh", "profile" -> "prof",
    "simhash" -> "simh", "txn_gen" -> "txg", "use_tax" -> "uset",
    "phash_pairs" -> "php", "salted_join" -> "sltj",
    "salted_agg" -> "slta", "rolling_fp" -> "rfp",
    "range_join" -> "rj", "lead_ntile" -> "nt",
    "sessionize" -> "se", "asof_join" -> "asof",
    "anti_join" -> "anti", "semi_join" -> "semi",
    "key_union" -> "kun", "retention" -> "ret",
    "pii_scrub" -> "pii", "ann_recall" -> "anr",
    "fuzzy_join" -> "fzy", "period_gen" -> "per",
    "repetition" -> "rep", "source_mix" -> "sm",
    "ivfpq_ann" -> "ipq", "quickscan" -> "qs",
    "stream_join" -> "sjn", "json_extract" -> "jsx",
    "batch_agg" -> "bat", "pq_encode" -> "pqe",
    "rate_join" -> "rtj", "topk_desc" -> "tkd",
    "ann_topk" -> "atk", "distinct" -> "dist",
    "smj_join" -> "smj", "temp_mix" -> "tm",
    "ivf_ann" -> "ivf", "resample" -> "rsm",
    "image_phash" -> "iph", "image_resize" -> "irs",
    "bpe_pairs" -> "bpe", "oov_rate" -> "oov",
    "bpe_apply" -> "bpea", "line_dups" -> "lnd",
    "incr_dedup" -> "incd", "sem_dedup" -> "semd",
    "incr_sem_dedup" -> "isd", "perceptron_step" -> "pst",
    "bucketed_join" -> "bkj", "best_survivors" -> "bsv",
    "embed_outliers" -> "eol", "schema_merge" -> "scm",
    "skew_stats" -> "skw", "fk_audit" -> "fka",
    "sample_quantiles" -> "sqt", "dup_ngram_frac" -> "dnf",
    "ngram_novelty" -> "nnv", "stream_topk" -> "stk",
    "compact_files" -> "cpf", "winsorize" -> "wz",
    "bucketed_agg" -> "bka", "cdc_chunks" -> "cdc",
    "json_corrupt" -> "jc", "cluster_sizes" -> "cls",
    "minhash_error" -> "mhe",
    "incr_compact" -> "icc", "incr_sem_compact" -> "isc",
    "incr_pipeline" -> "ipl", "stream_neardup" -> "snd",
    "cap_per_key" -> "cpk", "weighted_sample" -> "wsm",
    "weighted_race" -> "wrc",
    "dup_attribution" -> "dat", "semdedup_sweep" -> "sds",
    "dsir_weights" -> "dsw", "dsir_select" -> "dss",
    "length_hist" -> "lh", "quality_floor" -> "qf",
    "minhash_sweep" -> "mhs", "cross_source_overlap" -> "cso",
    "knn_classify" -> "knc", "embed_drift" -> "edr",
    "tok_fertility" -> "tf", "corpus_drift" -> "cdr",
    "mix_schedule" -> "mix", "stream_drift" -> "sdr",
    "snapshot_diff" -> "snp", "split_leakage" -> "slk",
    "vocab_shift" -> "vsh", "simhash_pairs" -> "shp",
    "k_anonymity" -> "kan", "band_stats" -> "bnst",
    "k_generalize" -> "kgn", "l_diversity" -> "ldv",
    "race_per_key" -> "rpk", "score_auc" -> "auc",
    "simhash_recall" -> "shr", "lm_logprob" -> "lmp",
    "l_generalize" -> "lgn", "incr_sem_trained" -> "ist",
    "substr_runs" -> "sbr", "ccnet_buckets" -> "ccb",
    "dp_counts" -> "dpc", "substr_scrub" -> "sbs",
    "c4_rules" -> "c4", "char_diversity" -> "chd",
    "linear_score" -> "lin", "rand_proj" -> "rpj",
    "containment" -> "ctn", "knn_graph" -> "knn",
    "kmv_by_group" -> "kvg", "asof_stale" -> "ast",
    "ngram_lang_id" -> "nli", "chi2_terms" -> "x2",
    "kmeans_step" -> "kmn", "kmeans_iter" -> "kmi",
    "trained_ivf_ann" -> "tiv", "grouping_sets" -> "gst",
    "bloom_join" -> "blm", "rank_stats" -> "rkst",
    "triangles" -> "tri", "corr_stats" -> "corr",
    "pagerank" -> "pgr", "cooccur" -> "cc",
    "moments" -> "mom", "rolling_avg" -> "ravg",
    "transitions" -> "tr", "dataset_card" -> "dc",
    "funnel" -> "fnl", "except" -> "exc", "rollup" -> "rlp",
    "alerts" -> "alr", "pivot" -> "pvt", "chunk" -> "chk",
    "rolling_actives" -> "ract", "degree_hist" -> "dgh",
    "union" -> "uni", "pit_join" -> "pit")
  // No aliases were added after round 14: at query #236 the catalog
  // crossed the point where even the integer-seconds NAMED-KEY rung of
  // [[metricLine]] exceeds the 1960-char budget on a healthy (sub-10 s
  // per query) sweep, and no legal birth-alias batch can buy it back
  // (the closed rename ledger pins every historical key; Σ keylen would
  // need ~1.9 chars/key). From round 15 on, a healthy full-catalog sweep
  // emits the keyless self-describing "qv" values array (ascending
  // unaliased query-name order — the encoding the round-13 ladder
  // extension added for exactly this point), and per-query KEYED trend
  // data lives in the committed BENCH_FULL_LOCAL.json sidecar, which has
  // always been the full-fidelity ledger. BenchAliasSpec pins the rung.

  /** Machine-readable metric-line key RENAMES (old key → current key),
    * cumulative since the round-6 "stable" §9.2 table: apply to the
    * per-query map of a historical BENCH_r{N}.json to rekey it into the
    * current encoding before trending across rounds. Round 8: nine alias
    * shortenings plus six formerly-unaliased keys that gained aliases;
    * round 9: two shortenings (op_bpe_apply's new key forced headroom);
    * round 10: thirty-two shortenings freeing ~72 worst-case chars so the
    * next several catalog additions don't re-trip the line-fit guard.
    * BenchAliasSpec pins every value to a live metric key and every old
    * key to NOT be one (a rename can't silently alias a live query). */
  val aliasRenames: Map[String, String] = Map(
    // round 8
    "batch" -> "bat", "bloom" -> "blm", "claims" -> "clm",
    "dtrunc" -> "dt", "fuzzy" -> "fzy", "gsets" -> "gst",
    "kmeans" -> "kmn", "nexus" -> "nx", "resmpl" -> "rsm",
    "funnel" -> "fnl", "except" -> "exc", "rollup" -> "rlp",
    "alerts" -> "alr", "pivot" -> "pvt", "chunk" -> "chk",
    // round 9
    "repeat" -> "rep", "key_un" -> "kun",
    // round 10
    "ann_tk" -> "atk", "aud_ft" -> "aft", "doc_fp" -> "dfp",
    "med_ft" -> "mft", "img_ft" -> "ift", "h_qtl" -> "hqt",
    "e_near" -> "enr", "f_proj" -> "fpj", "f_semi" -> "fsm",
    "rng_j" -> "rj", "rate_j" -> "rtj", "stbrk" -> "sbk",
    "strat" -> "sf", "s_win" -> "swn", "quant" -> "qz",
    "pq_enc" -> "pqe", "ivfpq" -> "ipq", "rf_rpt" -> "rrp",
    "rf_st" -> "rst", "rf_cl" -> "rfc", "t_det" -> "tdt",
    "s_nx" -> "snx", "c_bkt" -> "cbk", "h_smp" -> "hsm",
    "dd_rec" -> "ddr", "dd_cl" -> "ddc", "mh_p" -> "mhp",
    "ph_p" -> "php", "i_ph" -> "iph", "i_rs" -> "irs",
    "ev_win" -> "evw", "jsrt" -> "jrt",
    // round 10, second batch (the four new r10 query keys re-consumed
    // the margin): twelve more shortenings, ~28 worst-case chars freed
    "st_ex" -> "sx", "split" -> "spl", "shard" -> "shd",
    "rates" -> "rl", "qscan" -> "qs", "ntile" -> "nt",
    "sses" -> "ss", "ndup" -> "nd", "winw" -> "ww",
    "csvr" -> "cv", "orcr" -> "oc", "vcov" -> "vc",
    // round 10, third batch (ctn/knn/kvg consumed the margin again)
    "tokc" -> "tc", "subw" -> "sw", "qual" -> "ql",
    "dcard" -> "dc", "boil" -> "bl", "sess" -> "se",
    "smix" -> "sm", "tmix" -> "tm", "hneg" -> "hn",
    "enorm" -> "en", "cooc" -> "cc", "trans" -> "tr",
    // round 10, fourth batch (ast/nli consumed the margin)
    "cur" -> "cp", "tka" -> "tk",
    "rfr" -> "rr", "ddl" -> "fd", "dtr" -> "dt",
    "stq" -> "sq", "rfs" -> "rf", "cent" -> "lc",
    "vft" -> "vf", "unks" -> "us", "wrnk" -> "wr")
  // The ledger above is CLOSED (round-11 decision): live keys are never
  // renamed again. A NEW query may still take a short alias at birth (no
  // ledger entry — the key never trended under another name), and when
  // the catalog outgrows the stdout line the [[metricLine]] ladder
  // degrades it (slim levels, then drop-cheapest with q_omitted) while
  // the committed BENCH_FULL_LOCAL.json sidecar keeps full fidelity.
  // BenchAliasSpec pins the ladder contract and that every ledger source
  // is a genuine historical key (it appears in a committed BENCH_r*.json
  // metric line — a phantom source can never enter the ledger again).

  /** Metric-line key for a catalog query name: strip "op_", then alias. */
  def metricKey(name: String): String = {
    val s = name.stripPrefix("op_")
    alias.getOrElse(s, s)
  }

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** DESCENDING pass-1-cost schedule for the budgeted second pass: slowest
    * queries first (name tiebreak). The r16 lesson inverted the r15 one:
    * cheapest-first maximized COVERAGE COUNT, but on a contended box the
    * headline's distortion lives entirely in the pass-1 OUTLIERS (a 0.9 s
    * query reading 35 s of scheduler noise), and cheapest-first spent the
    * whole budget re-measuring queries that were already fine while the
    * outliers kept their bogus numbers and the official total regressed
    * +57% on zero code change. Slowest-first re-measures exactly the
    * queries whose pass-1 reading dominates (and most distorts) the
    * min-of-2 sum — each warm hit there removes the most headline error
    * per budget-second; the cheap tail a partial budget leaves uncovered
    * contributes near-zero either way. Pure so BenchSidecarSpec pins the
    * order. */
  def pass2Order(p1: Map[String, Double]): Seq[String] =
    p1.toSeq.sortBy { case (n, v) => (-v, n) }.map(_._1)

  /** Contention detector: warm-up seconds beyond which the box is flagged
    * `contended` in the sidecar and metric line. The warm-up (session init
    * + parquet footers + the one-time shared-lineage persist) is the same
    * fixed work every run, so its wall time is a pure load probe:
    * calibrated on the sf0.1 history — builder-box readings span 8-24 s
    * (the 24.2 s run's per-query minima sat INSIDE the idle ambient band,
    * so it must not flag), the contended driver box read 31.9 s (r16) —
    * the threshold splits the two regimes. At smaller SFs warm-up
    * is far cheaper and the flag simply never fires; false negatives on a
    * lightly-contended box are fine (the flag is an adjudication AID for
    * headline readers, not a gate). */
  val contendedWarmSec: Double = 28.0

  /** Pass-2 time budget in seconds. The default (no override) is the
    * contended-box guard: whatever the old 420 s all-or-nothing wall
    * left after warmup + pass 1, floored at 120 s. `SPARK_GRAFT_P2_BUDGET`
    * overrides it — `full` (or any non-numeric value) = unbounded, a
    * number = that many seconds — so an IDLE box can run pass 2 to
    * COMPLETION and commit a sidecar with `agg = min_of_2`, keeping the
    * round-over-round headline comparable (the r15 lesson: a budgeted
    * cheapest-first pass 2 on the idle box left the expensive tail on
    * cold pass-1 numbers and the headline read as a 2× regression).
    * `NaN` parses numerically but would make the budget predicate
    * always-false — it maps to unbounded like any other non-numeric
    * string; a negative number clamps to an explicit ZERO budget
    * (deliberate pass-2 skip).
    * When `p2_covered` < catalog size anyway, `pass1_total` is the
    * cross-round trend metric, not the partial min-of-2 headline. Pure
    * so BenchSidecarSpec pins the override grammar. */
  def p2BudgetFor(elapsed: Double, env: Option[String]): Double =
    env match {
      case Some(s) =>
        val v = try { s.toDouble } catch {
          case _: NumberFormatException => Double.PositiveInfinity
        }
        // parseDouble accepts "NaN" — and elapsed < NaN is always false,
        // which would SILENTLY skip pass 2, the opposite of the
        // documented non-numeric = unbounded grammar; negatives clamp to
        // an explicit zero budget (deliberate pass-2 skip)
        if (v.isNaN) Double.PositiveInfinity else math.max(0.0, v)
      case None => math.max(120.0, 420.0 - elapsed)
    }

  /** Full-fidelity sidecar JSON (round-10 headroom decision, SURVEY §9.2):
    * unaliased query names, 3-decimal seconds, min-of-2 AND pass-1 values —
    * the trend ledger that survives any stdout-line degradation. Pure so
    * BenchSidecarSpec can pin the format without running a bench.
    * `p2Covered` ≥ 0 marks a BUDGETED second pass (agg min_of_2_partial):
    * how many queries got both passes — the per-query two-pass data for the
    * warm subset survives even on a contended box. */
  def sidecarJson(total: Double, agg: String, warmSec: Double,
      p1Total: Double, failed: Seq[String], sfDir: String,
      results: Map[String, Double], p1: Map[String, Double],
      p2Covered: Int = -1): String = {
    def fullJson(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cov = if (p2Covered >= 0) s""""p2_covered":$p2Covered,""" else ""
    // contended rides in the full-fidelity ledger ALWAYS (true or false):
    // a future reader diffing headlines across rounds adjudicates
    // contention from the committed file without judge forensics
    val cont = warmSec > contendedWarmSec
    s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""exec":"plan","agg":"$agg","warm_sec":${f3(warmSec)},"contended":$cont,""" +
      s""""pass1_total":${f3(p1Total)},""" +
      s"""$cov"failed":$failedJson,"sf":"$sfDir",""" +
      s""""queries":${fullJson(results)},"pass1":${fullJson(p1)}}"""
  }

  /** The stdout metric line with its degradation ladder — PURE so
    * BenchAliasSpec can pin the contract at any catalog size without
    * running a bench. The driver captures only the last ~2000 chars of
    * stdout and json-parses this line, so the emitted form must ALWAYS
    * fit that window: try slim levels 0-3 (each dropping informational
    * side fields, never per-query data), then the maximum number of
    * SLOWEST queries that fits (q_omitted = how many cheapest were
    * dropped — their trend data lives on in the sidecar). Failures are
    * never dropped at any level. */
  def metricLine(results: Seq[(String, Double)], total: Double, agg: String,
      warmSec: Double, p1Total: Double, failed: Seq[String],
      sfDir: String, p2Covered: Int = -1): String = {
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // a budgeted partial second pass is ALWAYS marked with its coverage —
    // the field rides next to agg at every slim level (a silent partial
    // would corrupt the min-of-2 trend exactly like a silent unit change)
    val covField = if (p2Covered >= 0) s""","p2_covered":$p2Covered""" else ""
    // contention flag: emitted ONLY when true (idle runs pay zero line
    // chars) and at EVERY slim level — a distorted headline without the
    // flag is exactly the r16 adjudication failure this field closes
    val contField =
      if (warmSec > contendedWarmSec) s""","contended":true""" else ""
    // Per-query values as INTEGER CENTISECONDS keyed by [[metricKey]]
    // ("op_" stripped, long names aliased per [[alias]] — SURVEY §9.2 maps
    // them back). The coarsened slim-4 level divides to DECISECONDS
    // instead (marked `"qunit":"ds"` on the line).
    def qJson(m: Seq[(String, Double)], div: Int): String = m
      .map { case (k, v) =>
        "\"" + metricKey(k) + "\":" + math.round(v * 100 / div).toString }
      .mkString("{", ",", "}")
    val sorted = results.sortBy(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Values-only encoding for the coarse rungs: every query's value in
    // ASCENDING unaliased-op-name order (the deterministic order any
    // reader reconstructs from the catalog), keys implied — key length
    // stops mattering, so ALL queries survive at any realistic size.
    def qArr(div: Int): String = sorted
      .map { case (_, v) => math.round(v * 100 / div).toString }
      .mkString("[", ",", "]")
    def line(qs: String, omitted: Int, slim: Int, unit: String): String = {
      val om = if (omitted > 0) s""","q_omitted":$omitted""" else ""
      // slim >= 1: drop the informational pass1_total and an EMPTY failed
      // list (never a non-empty one — failures must stay visible).
      // slim >= 2: also drop warm_sec and shorten sf to its basename.
      // slim >= 3: also drop the qunit/qprefix self-documentation (the
      // encoding is stable across rounds and documented in SURVEY §9) —
      // per-query trend data for every query outranks all side fields.
      // A non-default unit is ALWAYS marked, even at slim 3 (a silent
      // unit change would corrupt the trend ledger).
      val p1 = if (slim >= 1) "" else s""","pass1_total":${f(p1Total)}"""
      val fl = if (slim >= 1 && failed.isEmpty) "" else s""","failed":$failedJson"""
      val ws = if (slim >= 2) "" else s""","warm_sec":${f(warmSec)}"""
      val sf = if (slim >= 2) new java.io.File(sfDir).getName else sfDir
      val qu = if (slim >= 3) {
        if (unit == "cs") "" else s""","qunit":"$unit""""
      } else
        s""","qunit":"$unit","qkeys":"op_-stripped, aliased per SURVEY 9.2""""
      s"""{"metric":"total","value":${f(total)},"unit":"sec","agg":"$agg"$covField$contField$qu,"queries":$qs$om$p1$ws$fl,"sf":"$sf"}"""
    }
    // Values-array sibling of line() at slim 3: "qv" replaces "queries",
    // with the order spelled out so the encoding is self-describing. EVERY
    // declared query appears in qv — a failed query still records its
    // (meaningless) elapsed slot so positional alignment against the
    // catalog never shifts; the failed list marks which values to ignore.
    // The qorder string says so explicitly.
    def lineArr(unit: String): String = {
      val fl = if (failed.isEmpty) "" else s""","failed":$failedJson"""
      val sf = new java.io.File(sfDir).getName
      val div = if (unit == "ds") 10 else 100
      s"""{"metric":"total","value":${f(total)},"unit":"sec","agg":"$agg"$covField$contField""" +
        s""","qunit":"$unit","qorder":"asc query name, failed included","qv":${qArr(div)}""" +
        s"""$fl,"sf":"$sf"}"""
    }
    // hard guard: never emit a metric line that cannot fit the 2000-char
    // tail. Degrade in steps, each keeping MORE per-query data than the
    // next: full -> minus informational fields (3 levels) -> COARSEN the
    // per-query values, keeping every key (decisecond then integer-second
    // MAPS — 0.1/1 s granularity on the expensive sweeps that hit these
    // levels still trends fine, and all-keys-coarse beats some-keys-gone)
    // -> drop the KEYS but not the values (ds then s VALUES-ARRAY in
    // ascending query-name order — self-describing via "qorder", and key
    // length stops bounding the catalog) -> only then the MAXIMUM number
    // of slowest queries that fits (sorted by key for stable diffs, with
    // how many were dropped; seconds encoding) — dropping only the
    // cheapest queries' trend data. 1960 leaves 40 chars of margin to
    // the true window.
    val bySlow = sorted.sortBy(-_._2)
    ((0 to 3).map(s => line(qJson(sorted, 1), 0, s, "cs")) :+
        line(qJson(sorted, 10), 0, 3, "ds") :+
        line(qJson(sorted, 100), 0, 3, "s") :+
        lineArr("ds") :+ lineArr("s"))
      .find(_.length <= 1960)
      .getOrElse(Iterator.range(bySlow.length - 1, 0, -1)
        .map { n =>
          line(qJson(bySlow.take(n).sortBy(_._1), 100), sorted.length - n,
            slim = 3, unit = "s")
        }
        .find(_.length <= 1960)
        .getOrElse(line("{}", sorted.length, slim = 3, unit = "s")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: session init, parquet footer reads, and a ONE-TIME
    // materialization of the shared tax/refund/dedup lineages (reused by
    // 20+ queries via the CacheManager).
    val w0 = System.nanoTime()
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      // sequential on purpose: each materialization already fills all
      // executor slots, so concurrent counts only add contention
      Catalog.sharedFrames(spark, sfDir).foreach(
        _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count())
    } catch { case _: Throwable => }
    val warmSec = (System.nanoTime() - w0) / 1e9
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // Execute each query's OWN physical plan (toRdd), NOT Dataset.count():
    // round-17 finding — Catalyst re-optimizes the count() plan and can
    // prune expensive subtrees whose row count is statically derivable
    // (unique-key left-join elimination made op_mrr's brute scan vanish:
    // 0.4 s measured for a 60+ s plan at ×100; a CountAudit sweep found
    // 36 queries with count-pruned leaves). toRdd runs the declared plan
    // as planned — what the bench claims to measure. Convention change
    // marked "exec":"plan" in the sidecar; pre-r17 per-query trends for
    // the pruned set under-measured.
    def runPlan(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    def pass(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { runPlan(fn(spark, sfDir)) }
        catch { case _: Throwable => failed += name }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    val p1 = pass()
    // Second pass under a TIME BUDGET instead of the round-13 all-or-
    // nothing 420 s guard (which produced a pass1_only artifact on the
    // driver's contended box — no per-query two-pass data at all): pass 2
    // visits queries slowest-pass-1-first (see [[pass2Order]] — the
    // expensive tail is exactly where a cold-JIT pass-1 reading is least
    // trustworthy, so warm those first) and stops STARTING new ones
    // once its budget is spent; what any budget cuts is the cheap tail,
    // whose pass-1 readings were near-asymptotic anyway.
    // Budget = what the old guard left (420 s minus warm+pass1), floored
    // at 120 s so a contended box ALWAYS attempts the warm subset. An
    // idle box exports SPARK_GRAFT_P2_BUDGET=full for a complete
    // min-of-2 sidecar (see [[p2BudgetFor]]).
    val elapsed = (System.nanoTime() - w0) / 1e9
    val p2Budget = p2BudgetFor(elapsed, sys.env.get("SPARK_GRAFT_P2_BUDGET"))
    val p2t0 = System.nanoTime()
    val byCost = pass2Order(p1)
    val qmap = SparkEntry.queries
    // A pass-2 exception records NO timing (flatMap drops the entry): a
    // fast failure is not a warm measurement, and min-of-2 must fall back
    // to the valid pass-1 value instead of absorbing the bogus minimum
    // into `results` and the summed total. The failed list still marks it.
    val p2: Map[String, Double] = byCost.iterator
      .takeWhile(_ => (System.nanoTime() - p2t0) / 1e9 < p2Budget)
      .flatMap { name =>
        val t0 = System.nanoTime()
        try {
          runPlan(qmap(name)(spark, sfDir))
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => failed += name; None }
      }.toMap
    val agg = if (p2.size == p1.size) "min_of_2" else "min_of_2_partial"
    val results = p1.map { case (k, v) =>
      k -> p2.get(k).map(math.min(v, _)).getOrElse(v) }
    // The driver captures only the last ~2000 chars of output and
    // json-parses the metric line — built by the pure [[metricLine]]
    // ladder and made the very last line (build.sbt suppresses sbt's
    // "[success]" trailer and forwards forked stdout unprefixed).
    // pass1_total = the first (cold-cache/JIT) sweep, for transparency
    // alongside the per-query minima that `value` sums. A query that threw
    // still reports its (meaningless) elapsed time — the failed list is
    // what marks it; the correctness gate is Verify, not this.
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val p1Total = if (p1.nonEmpty) p1.values.sum else 0.0
    spark.sparkContext.setLogLevel("ERROR") // keep shutdown quiet after the metric line
    val p2Covered = if (p2.size == p1.size) -1 else p2.size
    val out = metricLine(results.toSeq, total, agg, warmSec, p1Total,
      failed.toSeq, sfDir, p2Covered)
    // Durable full-fidelity sidecar (round-10 headroom decision, SURVEY
    // §9.2): the stdout line is the DRIVER contract and must fit its
    // 2000-char tail, so it degrades (slim levels, then drop-cheapest with
    // q_omitted). This file is the TREND ledger: full query names, 3-decimal
    // seconds, both passes — so stdout degradation never loses per-query
    // data; commit it with the round. Best-effort: a bench must never fail
    // on a read-only working dir.
    try {
      val side = sidecarJson(total, agg, warmSec, p1Total, failed.toSeq,
        sfDir, results, p1, p2Covered)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL_LOCAL.json"),
        (side + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => }
    println(out)
    System.out.flush()
    spark.stop()
  }
}
