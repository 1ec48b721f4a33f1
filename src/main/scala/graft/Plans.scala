package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: the executed physical plans of the headline
  * queries, as evidence for the optimization claims (predicate
  * pushdown, column pruning, broadcast dims, shared window shuffles).
  * Run: sbt "runMain graft.Plans"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "PLANS.md"
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq(
      "q06_filter_agg" -> "filter pushdown + column pruning at the scan",
      "q05_local_supplier" -> "multi-way join, dimensions broadcast",
      "q_movement" -> "per-track window pipeline sharing ONE hash shuffle (plus the r17 input-parallelism floor's round-robin spread of the single-split events parse)",
      "q_ts_wavelet" -> "wavelet energies: one scan, one shuffle, one aggregate",
      "q_asof_join" -> "as-of join as a single-shuffle union+window",
      "q_jaccard_pairs" -> "inverted-index near-dup: per-doc shingle arrays persisted (sizes map-side), ONE posting shuffle into bucket groups, generator pair expansion",
      "q_cos_dedup" -> "embedding near-dup: map-only LSH buckets, id-only candidate dedup, embeddings joined back once, codegen'd dot product",
      "q_minhash_pairs" -> "MinHash near-dup: one signature-kernel pass (spread by the r17 input-parallelism floor when the input scans narrower than the cores), band buckets through the single-shuffle posting kernel",
      "q_simhash_pairs" -> "SimHash near-dup: bucket groups + first-agreeing-band filter — pair uniqueness is structural, no distinct shuffle",
      "q_gap_fill" -> "gap interpolation: segment explode from lead window — two shuffles, no dense-axis join",
      "q_track_split" -> "division-aware track assignment: spots/edges cogrouped by video (one shuffle each), sequential per-video local choices — no iterative rounds",
      "q_qc_frame_dist" -> "QC step-distance stats: algebraic-only final aggregate; exact median via distributed sort selection, NO single-task percentile buffer",
      "q_roi_shape" -> "ROI polygon shape features: codegen'd synthetic-ROI + geometry kernels, map-only (scan-bound)",
      "q_tfidf" -> "corpus TF-IDF: map-side-combined (doc, term) aggregate, term-keyed join, corpus size as in-plan broadcast scalar",
      "q_dedup_clusters" -> "dedup keep-list: pair evidence transitively closed (contraction + adaptive small-graph collapse), canonical per cluster",
      "q_text_repetition" -> "Gopher repetition: ONE fused map-only codegen kernel (RepetitionStats) — no Exchange, no explode",
      "q_link_nn" -> "spot linking: grid-binned candidate join (SHUFFLE_HASH on the un-exploded parents), packed (gap, quantized d2, id) min — a HASH aggregate, not a min_by sort aggregate — no cross join, no broadcast of the corpus",
      "q_link_mutual" -> "mutual-NN 1-1 matching: candidates symmetrized map-side (Generate), ONE spot-keyed shuffle + ONE hash aggregate computing both packed argmins (r5 cached the candidate set and ran two SortAggregates), semi-join of the tiny per-spot projections",
      "q_link_lap" -> "exact LAP assignment: explicit-width repartition on the frame-pair key (exempt from AQE coalescing — groups are CPU-dense, not byte-dense), per-partition Hungarian solves",
      "q_gct" -> "two-phase LAP tracker: frame-to-frame Hungarian, then labels + segment gap-close Hungarian + relabel FUSED into ONE cogroup per video — the corpus shuffles once per input, everything else is local per video; nothing iterative, nothing driver-side",
      "q_decon" -> "test-set decontamination: the fixed-size eval shingle set rides as the BROADCAST side, the corpus is scanned once map-only into the broadcast-hash join, and only the matched postings (a vanishing fraction) shuffle for the pair aggregate",
      "q_pack" -> "sequence packing: two-level distributed scan — range partition, per-partition window cumsums in PARALLEL (keyed by partition id, not one global single-task window), width-bounded totals collect, broadcast partition-offset add",
      "q_ldedup" -> "corpus-wide boilerplate-line removal: exploded lines persisted once, map-side partial aggregates, output-sized hot set broadcast by AQE, hot-mark join + ONE per-doc aggregate rebuilding text and counts together",
      "q_rjr" -> "range join written NAIVELY (inequality-only condition — stock Spark: BroadcastNestedLoopJoin) and rewritten by the injected RangeJoinRule to the binned equi-join: point-bin vs sequence-exploded interval bins, original predicate re-applied",
      "q_semdedup" -> "SemDeDup keep-list: centroids scored as literal-array dot products MAP-SIDE (no assignment shuffle), multi-probe explode, NARROW (cell, id, probe-bitmask) candidate self-join — embeddings never enter the pair-grain exchange, and pair uniqueness is the r17 minimum-shared-cell bitmask witness filter (integer ops on the join output) instead of a distinct exchange — then embeddings join back to score each pair once, component closure over the pair evidence",
      "q_span" -> "ExactSubstr span dedup: map-side gram materialization from the token array, ONE corpus shuffle electing canonical occurrences via packed-long min (HASH aggregate), output-sized dup-start join-back, island merge + rebuild as map-side array folds",
      "q_dsir" -> "DSIR data selection: one cached BigramCounts kernel pass feeds BOTH corpus LMs in a single bounded aggregate (≤39² rows collected), scoring is the fused map-only BigramScore kernel on the cached arrays — no second corpus scan",
      "q_attrs" -> "fused attribute pass: every per-doc quality/repetition/lang-ID signal in ONE map-only whole-stage-codegen select over ONE corpus scan — at 100 TB this replaces five separate scans",
      "q_ragc" -> "RAG chunking with overlap: split once per row, windows from an in-row sequence+explode — map-only, no shuffle, no window function",
      "q_hardneg" -> "hard-negative mining: broadcast queries, one corpus scan with the label gate inside the join condition, per-query top-k via WindowGroupLimit pushdown",
      "q_entropy3" -> "trigram-LM scoring: one TrigramCounts kernel pass cached at doc grain, the 39³-bounded model collected and re-entering as a plan literal inside the fused map-only TrigramScore kernel",
      "q_fdecon" -> "fuzzy decontamination: eval shingles broadcast, corpus scanned once, shingle-set sizes riding the matched postings so the Jaccard denominator needs no join-back",
      "q_mm_corpus" -> "multimodal corpus build: the image-dedup stage shuffles 8-byte perceptual hashes (never pixels), the scene/audio gates aggregate the OUTPUTS of batched decode passes, cluster closure is the log-round CC, and each stage's survivor set persists into the next",
      "q_incdedup" -> "incremental snapshot-vs-batch dedup: the corpus shuffles ONCE into the hash index, the Bloom filter rides the plan as a binary literal probed by the codegen'd might_contain FILTER below the join, and the verify join reuses the index's hash partitioning — bloom-negative rows never enter any exchange",
      "q_srcgate" -> "source-grain quality gate: ONE corpus scan with the qualityKeep predicate fused map-side into the per-source hash aggregate (countDistinct two-phase for the dup mass); the doc-level filter this feeds is a broadcast left-semi join",
      "q_shuf" -> "deterministic corpus shuffle: splitmix64 key computed in the scan project, ONE range exchange, per-partition row_number in parallel, width-bounded counts collect, broadcast prefix add — no single-task global window",
      "q_drift" -> "corpus drift: two token-grain map-side-combined aggregates (the only corpus-sized shuffles), a vocabulary-grain full outer join, totals as an in-plan broadcast one-row aggregate, TakeOrdered top-k",
      "q_editjoin" -> "exact edit-distance fuzzy join: codegen'd array-transform segment/probe generation (no UDF), an EQUI-join on (length, segment, substring) — no cartesian, no BroadcastNestedLoopJoin — and the bounded-threshold levenshtein gate BEFORE the pair dedup",
      "q_manifest" -> "release manifest: the shuffle layout's one range exchange + rank, a doc_id join back to the payload, and ONE map-side-combined bit_xor aggregate per shard — checksums are membership functions, so no sort appears anywhere",
      "q_corpus2" -> "corpus build v2 (the registry's most expensive genuine query): the r17 parallelism floor spreads the chain head once, the provenance gate is ONE extra source-grain aggregate + a broadcast-semi doc filter prepended as stage 0 — the corpus never re-shuffles for the gate; downstream, each stage's survivor id-set persists and re-enters as the next stage's semi-join side, exact dedup shuffles 8-byte hashes, the jaccard stage reuses the shingle-posting kernel, and the final keep-list is the log-round CC closure — no stage rescans the raw corpus",
      "q_incnear" -> "incremental near-dup against the corpus band index: ONE map-only signature pass per side, candidates from an EQUI-join on the 8-byte (band, bh) bucket key — only bucket collisions shuffle, corpus text never re-shingled — estimate as a codegen'd zip_with/aggregate over the carried signatures, dup_of by packed min_by",
      "q_profile" -> "one-pass data profiling: the stacked (column, value) explode feeds ONE map-side-combined value-grain count — the only full-data exchange; distincts, null mass, min/max and the top-k heads all aggregate that small table at column grain",
      "q_interact" -> "track interaction: grid-binned same-frame proximity join (equi-keys (f, cx, cy), 3x3 probe explode — no track-pair cross join), candidate pairs deduped on an EXPLICIT-width pair exchange (r17 — AQE's size-based coalescing packed the byte-tiny pair set and the whole CPU-dense phase 2 behind it onto one task), then ONLY the candidate sliver joins back to the persisted step series; decimal-quantized correlation sums aggregate map-side; the density fail-fast rides a broadcast join against the normally-empty overflow cells",
      "q_nnd" -> "NN-descent K-NN graph: every round is equi-joins/aggs on node id only — reverse-capped adjacency self-join moves 8-byte id pairs, the per-round state trim is ONE bounded top-k aggregate (r17 TopKEdges: map-side partials collapse to k entries per node before the exchange; under the narrow profile the candidate dedup exchange is skipped — broadcast re-scores are cheaper, and at full width the distinct stays), state re-rooted on a persisted RDD per round, convergence counted by the materializing job itself",
      "q_walk" -> "graph-ANN serving: beam search over the PERSISTED K-NN graph. BELOW the driver caps (r18 — both hop-join build sides were already driver-materialized per hop as broadcasts) the hop loop runs on the driver over the collected adjacency/vectors with the SAME kernels (DotProduct's accumulation order, TopKEdges.prune itself), bit-identical (ProfileParitySpec + an sf0.1 three-profile check), so the served plan at this SF is the ranked LocalRelation shown here after a handful of setup jobs. Above the caps the r17 distributed hop shape is unchanged: per hop the frontier equi-joins the symmetrized 8-byte adjacency, embeddings join in for DISTINCT proposals only, the beam re-selection is ONE bounded top-k aggregate, state re-rooted per hop with the new-entrant count riding the materializing job",
      "q_rrf" -> "hybrid RRF retrieval: BM25's broadcast-filtered postings + bruteTopK's broadcast-query corpus scan each emit a |queries|*k ranked sliver; fusion is a union + one (query, doc) aggregate + one per-query window on slivers — corpus-independent",
      "q_gsplit" -> "leakage-safe grouped split: MAP-ONLY — the group key hashes per-row (PolyFingerprint mod 100), no group table, no join, no exchange anywhere in the plan",
      "q_gdedup" -> "K-NN-graph dedup: a map filter over the persisted graph's n*k 8-byte edge rows, then the log-round CC closure on the surviving sliver — the corpus embeddings are never rescanned, no pair generation anywhere",
      "q_html" -> "HTML extraction: three codegen'd regex passes in ONE map-only whole-stage-codegen select — no shuffle, the cost is the scan",
      "q_pool" -> "group mean-pooling: (group, dim, value) explode collapsed by MAP-SIDE partial aggregation to groups*dim partials before the one exchange — the shuffle carries sums, never vectors",
      "q_quant" -> "int8 quantization: in-row absmax fold + in-row transform at (vec_id, dim) grain — map-only, no exchange anywhere",
      "q_vad" -> "voice-activity segmentation: the batched one-pass PCM decode, then ONE doc-grain window over the rms-gated sliver + one segment-grain aggregate — gaps-and-islands, never a dense self-join",
      "q_afp" -> "audio fingerprint dedup: per-asset collect bounded at bits+1 frames BEFORE the one doc-grain aggregate, in-row MSB-first fold, duplicate grouping a window on the 8-byte (n_bits, fp) key",
      "q_knn_ins" -> "graph-ANN incremental insert: beam-searched cross edges over the persisted base graph (the r18 driver-local walk below its caps) + batch-local brute/descent edges; the batch/sliver-grain list trims run on the narrowed clone and re-root on persisted RDDs (r18 — they were ~20 caller-width AQE stage-jobs of launch latency), while the corpus-scale passthrough stays THIS caller-width plan: a map-only broadcast anti join — every untouched base row rides through unshuffled, so the plan's cost scales with the batch, never the corpus",
      "q_url" -> "URL canonicalization + domain rollup: the six regex rules fuse into ONE map-only whole-stage-codegen select; the domain rollup is one hash aggregate joined back — nothing else exchanges",
      "q_qsk" -> "incremental quantile sketches: the bottom-k Aggregator's partial aggregation collapses every partition MAP-SIDE to <= k entries before each batch's one exchange; the union stage merges per-part ARRAYS (objectHashAggregate, no explode — sibling exact counts never fan out); the estimate is in-row array math",
      "q_bm25c" -> "BM25 serving THROUGH compaction: the same query-term bucket PartitionFilters + broadcast term join as the incremental index, now over one-file buckets — compaction changed the file census, not one operator of the serving plan",
      "q_bm25i" -> "incremental BM25 index serving (the r16 manifest-store lifecycle): the query terms' buckets select manifest LINES before any scan — the static prune is file-list construction, untouched buckets never reach the plan — then the pruned postings join the broadcast term table and the meta parts fold to the corpus stats; the scoring tail is the direct query's, which is why it reuses that oracle verbatim",
      "q_cdcm" -> "materialized CDC snapshot read: the committed bucket files resolve from ONE manifest read and scan directly — a merge REPLACES its buckets' lines, so every bucket is exactly one live file and the serve-time plan is a pruned file-list scan + op filter, with zero dedup or version-resolution work left to do",
      "q_rank2" -> "warm-started PageRank refresh. BELOW the 500k-edge driver cap (r18 — a sub-cap graph is a few MB of longs and the distributed loop is pure launch latency) the identical integer fixed-point recurrence runs as one driver loop over the collected deduped edge list, bit-identical (ProfileParitySpec pins local == narrow == wide for cold and warm), so the served plan at this SF is the (node, rank) LocalRelation. Above the cap the distributed round is unchanged: static edges+outdeg equi-joined to the RDD-re-rooted ranks, ONE dst hash aggregate, the dangling mass a broadcast one-row cross join — identical round shape to the cold recurrence, only the seed differs",
      "q_icorpus" -> "incremental corpus ASSEMBLY (the served output after the eager increment folded the batch into the artifacts): a map-side intrinsic filter (dflag) over exdocs, ONE dup-evidence-sized labels join for the canonical keep, and the map-only Lehmer sampling filter — corpus TEXT appears nowhere in the plan, because every text-grain stage was paid at ingest")
    val sb = new StringBuilder
    sb.append("# Executed physical plans (sf0.001, AQE final plans)\n\n")
    sb.append("Generated by `graft.Plans`; regenerate after plan-affecting changes.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
