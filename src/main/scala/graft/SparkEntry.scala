package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline ops) is exposed in [[queries]]; SQL-expressible ones carry a
  * DuckDB oracle in [[oracleSql]]. Implementations live in [[QueryCatalog]].
  */
object SparkEntry {
  import QueryCatalog._

  /** Flagship: events-as-changelog replayed through the real engine
    * (chunked micro-batches → LWW MERGE → LakeTable snapshot).
    */
  def entry(spark: SparkSession): DataFrame =
    cdcReplayMerge(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC core (SURVEY §2.1/§2.4/§2.6)
    "q01_cdc_replay_merge" -> (cdcReplayMerge(_, _)),
    "q02_lww_dedup" -> (cdcLwwDedup(_, _)),
    "q03_lww_dedup_salted" -> (cdcLwwDedupSalted(_, _)),
    "q04_route_filter" -> (cdcRouteFilter(_, _)),
    // projection / transform rules (SURVEY §2.2)
    "q05_project_rename" -> (cdcProjectRename(_, _)),
    "q06_defaults_case" -> (cdcDefaultsCase(_, _)),
    "q07_encode_kv" -> (cdcEncodeKv(_, _)),
    "q08_template_key" -> (cdcTemplateKey(_, _)),
    "q09_date_format" -> (cdcDateFormat(_, _)),
    "q10_type_cast" -> (cdcTypeCast(_, _)),
    // sinks / script / metrics (SURVEY §2.4/§2.7/§2.8)
    "q11_changefeed" -> (cdcChangefeed(_, _)),
    "q12_changefeed_json" -> (cdcChangefeedJson(_, _)),
    "q13_script_transform" -> (cdcScriptTransform(_, _)),
    "q14_metrics" -> (cdcMetrics(_, _)),
    "q15_snapshot_reconcile" -> (cdcSnapshotReconcile(_, _)),
    // relational basics
    "q16_agg_q1" -> (aggQ1(_, _)),
    "q17_join_enrich" -> (joinEnrich(_, _)),
    // training-data: dedup
    "q18_doc_dedup_exact" -> (docDedupExact(_, _)),
    "q19_doc_fingerprint" -> (docFingerprint(_, _)),
    "q20_doc_fingerprint_rolling" -> (docFingerprintRolling(_, _)),
    "q21_doc_minhash_pairs" -> (docMinhashPairs(_, _)),
    "q22_doc_simhash_pairs" -> (docSimhashPairs(_, _)),
    "q23_doc_ngram_jaccard" -> (docNgramJaccardPairs(_, _)),
    // training-data: text analysis
    "q24_doc_text_stats" -> (docTextStats(_, _)),
    "q25_doc_quality" -> (docQuality(_, _)),
    // training-data: similarity
    "q26_emb_neardup" -> (embNearDupPairs(_, _)),
    "q27_emb_ann_topk" -> (embAnnTopK(_, _)),
    "q28_emb_ann_lsh" -> (embAnnLsh(_, _)),
    "q29_emb_ann_ivf" -> (embAnnIvf(_, _)),
    // training-data: multimodal
    "q30_mm_features" -> (mmFeatures(_, _)),
    "q31_mm_features_full" -> (mmFeaturesFull(_, _)),
    "q32_mm_frames" -> (mmFrameSample(_, _)),
    // S6 wildcard table expansion
    "q33_wildcard_tables" -> (wildcardTables(_, _)),
    // P5 completion: ENUM/SET/BIT decode
    "q34_enum_set_bit" -> (cdcEnumSetBit(_, _)),
    // stateful streaming surface (batch twins; streamed in StreamingExtrasSpec)
    "q35_windowed_rate" -> (windowedRate(_, _)),
    "q36_sessionize" -> (sessionize(_, _)),
    // P5 WAL-side completion: Postgres logical-decoding text values
    "q37_pg_decode" -> (cdcPgDecode(_, _)),
    // corpus-level pre-training summary (volume, token distribution, uniques)
    "q38_corpus_stats" -> (docCorpusStats(_, _)),
    // S1/S2 completion: standard Debezium/Maxwell CDC-envelope ingestion
    "q39_debezium_decode" -> (cdcDebeziumDecode(_, _)),
    // K1-K5 completion: structure-level op APPLICATION (list/set retraction)
    "q40_sinkop_apply" -> (cdcSinkOpApply(_, _)),
    // dedup completion: pair relation → connected components → keep-set
    "q41_dedup_clusters" -> (docDedupClusters(_, _)),
    // eval-set leakage filter: n-gram overlap vs a benchmark corpus
    "q42_decontaminate" -> (docDecontaminate(_, _)),
    // concat-and-chunk sample packing via distributed prefix sum
    "q43_pack_sequences" -> (docPackSequences(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_cdc_replay_merge" -> cdcReplayMergeSql,
    "q02_lww_dedup" -> cdcLwwDedupSql,
    "q03_lww_dedup_salted" -> cdcLwwDedupSql, // salted path must equal plain LWW
    "q04_route_filter" -> cdcRouteFilterSql,
    "q05_project_rename" -> cdcProjectRenameSql,
    "q06_defaults_case" -> cdcDefaultsCaseSql,
    "q07_encode_kv" -> cdcEncodeKvSql,
    "q08_template_key" -> cdcTemplateKeySql,
    "q09_date_format" -> cdcDateFormatSql,
    "q10_type_cast" -> cdcTypeCastSql,
    "q11_changefeed" -> cdcChangefeedSql,
    "q12_changefeed_json" -> cdcChangefeedJsonSql,
    "q13_script_transform" -> cdcScriptTransformSql,
    "q14_metrics" -> cdcMetricsSql,
    "q15_snapshot_reconcile" -> cdcSnapshotReconcileSql,
    "q16_agg_q1" -> aggQ1Sql,
    "q17_join_enrich" -> joinEnrichSql,
    "q18_doc_dedup_exact" -> docDedupExactSql,
    "q19_doc_fingerprint" -> docFingerprintSql,
    "q20_doc_fingerprint_rolling" -> docFingerprintRollingSql,
    "q21_doc_minhash_pairs" -> docMinhashPairsSql,
    "q22_doc_simhash_pairs" -> docSimhashPairsSql,
    "q23_doc_ngram_jaccard" -> docNgramJaccardPairsSql,
    "q24_doc_text_stats" -> docTextStatsSql,
    "q25_doc_quality" -> docQualitySql,
    "q26_emb_neardup" -> embNearDupPairsSql,
    "q27_emb_ann_topk" -> embAnnTopKSql,
    "q28_emb_ann_lsh" -> embAnnLshSql,
    "q29_emb_ann_ivf" -> embAnnIvfSql,
    "q30_mm_features" -> mmFeaturesSql,
    "q32_mm_frames" -> mmFrameSampleSql,
    "q33_wildcard_tables" -> wildcardTablesSql,
    "q34_enum_set_bit" -> cdcEnumSetBitSql,
    "q35_windowed_rate" -> windowedRateSql,
    "q36_sessionize" -> sessionizeSql,
    "q37_pg_decode" -> cdcPgDecodeSql,
    "q38_corpus_stats" -> docCorpusStatsSql,
    "q39_debezium_decode" -> cdcDebeziumDecodeSql,
    "q40_sinkop_apply" -> cdcSinkOpApplySql,
    "q41_dedup_clusters" -> docDedupClustersSql,
    "q42_decontaminate" -> docDecontaminateSql,
    "q43_pack_sequences" -> docPackSequencesSql
  )
}
