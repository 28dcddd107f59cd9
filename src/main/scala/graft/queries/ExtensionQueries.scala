package graft.queries

import graft.Tables
import graft.functions.{round2, round4, GeometricMean}
import graft.operators.{IvfIndex, Similarity, TextAnalysis, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extension surface: similarity search (Q26), text analysis (Q27),
  * streaming-unified windows (Q29 batch-checkable forms), UDF/UDAF/UDTF
  * (Q30), and the training-data-pipeline operators (dedup suite dd*,
  * text analysis ta*). Every oracle implements the *same deterministic
  * algorithm* in DuckDB SQL (md5-derived hashes, FP-path rounding), so
  * even approximate-by-nature ops (LSH) are exactly comparable.
  */
object ExtensionQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** The production IVF path: load a PERSISTED index, building it only
    * if absent or stale — so repeated searches (bench passes, a query
    * service) amortize the KMeans codebook fit to zero instead of
    * re-paying it per call the way the one-shot `q26_similarity_ivf`
    * entry does. Locally the index lives under the working dir's
    * gitignored `fixtures/` scratch; at 100 TB the same save/load
    * contract targets the distributed store and the search still reads
    * only the probed nProbe/nLists partition fraction.
    *
    * Cache discipline (review r13): [[graft.Fixtures.ensure]] — the
    * repo's ONE implementation of crash/concurrency-safe fixture
    * materialization (_SUCCESS written after the slow corpus write,
    * temp-dir build + atomic rename, JVM-wide lock). The version is the
    * embeddings table's mtime, so driver testdata regeneration
    * self-invalidates the index; superseded versions of THIS dataset's
    * index are pruned before ensure (each holds a full corpus copy —
    * Fixtures' abandon-on-disk default is fine for KB-scale partsupp,
    * not for per-regeneration corpus duplicates).
    */
  private def ivfLoaded(s: SparkSession, d: String): IvfIndex =
    IvfIndex.load(s, corpusFixture(d, "embeddings", "ivf") { tmp =>
      IvfIndex.build(t(s, d).embeddings.select(col("vec_id"), col("embedding")),
        nLists = 16, seed = 42L).save(tmp.toString)
    })

  /** Shared mtime-versioned fixture discipline for per-sfDir derived
    * indexes ([[ivfLoaded]], [[bandIndexLoaded]]): version = the source
    * table's mtime (driver testdata regeneration self-invalidates),
    * superseded versions of THIS dataset's fixture pruned before ensure
    * (each holds a corpus-sized artifact — Fixtures' abandon-on-disk
    * default fits KB-scale partsupp, not per-regeneration corpus
    * copies). One implementation so a prune-logic fix lands everywhere.
    */
  private def corpusFixture(d: String, sourceTable: String, prefix: String,
                            formatVer: String = "")(
      generate: java.io.File => Unit): String = {
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d, s"$sourceTable.parquet")).toMillis
    // formatVer participates in the version: a generator-format change
    // (e.g. the bucketed band-index layout) self-invalidates fixtures
    // built by the old formula even when the source mtime is unchanged.
    val ver = s"$mtime$formatVer"
    val name = s"$prefix-${graft.Fixtures.pathTag(d)}"
    val parent = new java.io.File(s"${sys.props("user.dir")}/fixtures")
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith(s"$name-") && f.getName != s"$name-$ver")
      .foreach(graft.Fixtures.deleteRecursively)
    graft.Fixtures.ensure(name, ver)(generate)
  }

  /** Persisted term-bucketed inverted index for ir02, via the shared
    * [[corpusFixture]] discipline. */
  private def invIndexLoaded(s: SparkSession, d: String): String =
    // formatVer c: meta gained the postingRows consistency witness
    // (stale-stats detection); b added the denormalized dl column +
    // persisted corpus stats (ir04 ranked retrieval)
    corpusFixture(d, "documents", "invidx", formatVer = "d") { tmp =>
      graft.operators.InvertedIndex.saveIndex(
        t(s, d).documents.select("doc_id", "text"), tmp.toString)
    }

  /** INCREMENTALLY-built inverted index for ir03: base index from the
    * "historical" slice (doc_id % 10 != 0), then the "nightly" slice
    * appended — only the new batch is ever tokenized. */
  private def invIndexIncremental(s: SparkSession, d: String): String =
    corpusFixture(d, "documents", "invidxinc", formatVer = "d") { tmp =>
      val docs = t(s, d).documents.select("doc_id", "text")
      graft.operators.InvertedIndex.saveIndex(
        docs.filter(col("doc_id") % 10 =!= 0), tmp.toString)
      graft.operators.InvertedIndex.appendToIndex(
        docs.filter(col("doc_id") % 10 === 0), tmp.toString)
    }

  /** Persisted semantic (k-means) index over the "historical"
    * embedding slice (vec_id % 10 != 0) for sd02, via the shared
    * [[corpusFixture]] discipline. */
  private def semIndexLoaded(s: SparkSession, dir: String): String =
    corpusFixture(dir, "embeddings", "semidx", formatVer = "b") { tmp =>
      graft.operators.Similarity.saveSemanticIndex(
        t(s, dir).embeddings.filter(col("vec_id") % 10 =!= 0)
          .select("vec_id", "embedding"),
        d = 64, k = 4, iterations = 2, path = tmp.toString)
    }

  /** Persisted product-quantization index over the full embedding
    * corpus for pq02, via the shared [[corpusFixture]] discipline. */
  private def pqIndexLoaded(s: SparkSession, dir: String): String =
    corpusFixture(dir, "embeddings", "pqidx", formatVer = "b") { tmp =>
      graft.operators.ProductQuantizer.savePqIndex(
        t(s, dir).embeddings.select("vec_id", "embedding"),
        d = 64, m = 4, k = 4, iterations = 2, path = tmp.toString)
    }

  /** INCREMENTALLY-built PQ index for pq05 (the invIndexIncremental
    * discipline): base index fitted on the "historical" slice
    * (vec_id % 10 != 0); the "nightly" slice is APPENDED — encoded
    * against the PERSISTED codebooks, the corpus never re-fit. */
  private def pqIndexIncremental(s: SparkSession, dir: String): String =
    corpusFixture(dir, "embeddings", "pqidxinc", formatVer = "b") { tmp =>
      val e = t(s, dir).embeddings.select("vec_id", "embedding")
      graft.operators.ProductQuantizer.savePqIndex(
        e.filter(col("vec_id") % 10 =!= 0),
        d = 64, m = 4, k = 4, iterations = 2, path = tmp.toString)
      graft.operators.ProductQuantizer.appendToPqIndex(
        e.filter(col("vec_id") % 10 === 0), tmp.toString)
    }

  /** pq05's incremental index built in THREE nightly appends and then
    * COMPACTED (ix01 — the maintenance lifecycle): content identical to
    * [[pqIndexIncremental]] — per-row encoding against the persisted
    * codebooks is batch-split-invariant, so pq05's oracle gates it
    * VERBATIM — but the file layout is the maintained one. Generation
    * asserts the compaction actually collapsed files, so the entry
    * can never silently degrade into re-testing the fragmented path. */
  private def pqIndexCompacted(s: SparkSession, dir: String): String =
    corpusFixture(dir, "embeddings", "pqidxcompact") { tmp =>
      val e = t(s, dir).embeddings.select("vec_id", "embedding")
      graft.operators.ProductQuantizer.savePqIndex(
        e.filter(col("vec_id") % 10 =!= 0),
        d = 64, m = 4, k = 4, iterations = 2, path = tmp.toString)
      Seq(0, 10, 20).foreach { n =>
        graft.operators.ProductQuantizer.appendToPqIndex(
          e.filter(col("vec_id") % 30 === n), tmp.toString)
      }
      val stats = graft.operators.ProductQuantizer.compactPqIndex(s, tmp.toString)
      require(stats.compacted && stats.filesAfter < stats.filesBefore,
        s"ix01 fixture expected a real compaction, got $stats")
    }

  /** Persisted IVF-PQ index over the full embedding corpus for pq06,
    * via the shared [[corpusFixture]] discipline — the fit (coarse
    * k-means + residual codebooks) is amortized into the fixture; the
    * query reads the two tiny centroid tables plus ONLY the probed
    * list partitions of the code table. */
  private def ivfPqIndexLoaded(s: SparkSession, dir: String): String =
    // formatVer b: ivf-pq meta v3 (per-list counts for the skew witness)
    corpusFixture(dir, "embeddings", "ivfpqidx", formatVer = "b") { tmp =>
      graft.operators.ProductQuantizer.saveIvfPqIndex(
        t(s, dir).embeddings.select("vec_id", "embedding"),
        d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
        kPq = 4, pqIterations = 1, path = tmp.toString)
    }

  /** INCREMENTALLY-built IVF-PQ index for pq07 (the pqIndexIncremental
    * discipline): coarse lists + residual codebooks fitted ONCE on the
    * "historical" slice (vec_id % 10 != 0); the "nightly" slice is
    * APPENDED — coarse-assigned and residual-encoded against the
    * PERSISTED geometry, the corpus never re-fit, the new code rows
    * landing in their list partitions. */
  private def ivfPqIndexIncremental(s: SparkSession, dir: String): String =
    // formatVer b: ivf-pq meta v3 (per-list counts for the skew witness)
    corpusFixture(dir, "embeddings", "ivfpqidxinc", formatVer = "b") { tmp =>
      val e = t(s, dir).embeddings.select("vec_id", "embedding")
      graft.operators.ProductQuantizer.saveIvfPqIndex(
        e.filter(col("vec_id") % 10 =!= 0),
        d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
        kPq = 4, pqIterations = 1, path = tmp.toString)
      graft.operators.ProductQuantizer.appendToIvfPqIndex(
        e.filter(col("vec_id") % 10 === 0), tmp.toString)
    }

  /** pq03's full IVFADC recomputation, shared VERBATIM with pq06 (the
    * Sd02Oracle discipline — one SQL text, so hash equality between
    * the inline stack and the persisted index cannot silently
    * desynchronize): coarse Lloyd (2 iterations, 4-smallest-id init),
    * residuals against the after-one-update centroids, residual
    * codebooks (1 iteration), 2-of-4 list probing, per-list ADC
    * tables, candidate sums, probe id 0 excluded. */
  /** pq05's full append-lifecycle recomputation (historical Lloyd,
    * batch argmin against the persisted centroids, ADC over the code
    * UNION), shared VERBATIM with ix01 (the IvfPqOracle discipline):
    * compaction is pure layout maintenance, so the compacted index
    * must hash-match the exact same SQL text as the fragmented one. */
  private val PqAppendOracle =
    """WITH v AS (SELECT vec_id AS id,
        |    CAST((i - 1) // 16 AS INTEGER) AS sub, CAST((i - 1) % 16 AS INTEGER) AS j,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 <> 0),
        |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
        |c0 AS (SELECT v.sub, init.cl, v.j, v.x AS c FROM v JOIN init USING (id)),
        |a1 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.sub, s1.cl, v.j, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 ON s1.id = v.id AND s1.sub = v.sub GROUP BY 1, 2, 3),
        |c1 AS (SELECT c0.sub, c0.cl, c0.j, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.sub = c0.sub AND c1u.cl = c0.cl AND c1u.j = c0.j),
        |a2 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s2 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |vb AS (SELECT vec_id AS id,
        |    CAST((i - 1) // 16 AS INTEGER) AS sub, CAST((i - 1) % 16 AS INTEGER) AS j,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 = 0),
        |ab AS (SELECT vb.id, vb.sub, c.cl, CAST(SUM((vb.x - c.c) * (vb.x - c.c)) AS BIGINT) AS dist
        |  FROM vb JOIN c1 c ON c.sub = vb.sub AND c.j = vb.j GROUP BY 1, 2, 3),
        |sb AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM ab) WHERE rn = 1),
        |codes AS (SELECT * FROM s2 UNION ALL SELECT * FROM sb),
        |pt AS (SELECT c1.sub, c1.cl, CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS pdist
        |  FROM c1 JOIN (SELECT sub, j, x FROM vb WHERE id = 0) p
        |    ON p.sub = c1.sub AND p.j = c1.j
        |  GROUP BY 1, 2),
        |adc AS (SELECT codes.id AS vec_id, CAST(SUM(pt.pdist) AS BIGINT) AS dist_u
        |  FROM codes JOIN pt ON pt.sub = codes.sub AND pt.cl = codes.cl
        |  WHERE codes.id <> 0 GROUP BY 1)
        |SELECT vec_id, dist_u FROM adc ORDER BY dist_u, vec_id LIMIT 10""".stripMargin

  private val IvfPqOracle =
    """WITH v AS (SELECT vec_id AS id, i,
      |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
      |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
      |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
      |c0 AS (SELECT init.cl, v.i, v.x AS c FROM v JOIN init USING (id)),
      |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
      |s1 AS (SELECT id, cl FROM (SELECT id, cl,
      |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
      |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
      |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
      |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
      |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
      |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
      |s2 AS (SELECT id, cl FROM (SELECT id, cl,
      |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
      |rv AS (SELECT v.id, CAST((v.i - 1) // 16 AS INTEGER) AS sub,
      |    CAST((v.i - 1) % 16 AS INTEGER) AS j, v.x - c1.c AS x
      |  FROM v JOIN s2 ON s2.id = v.id JOIN c1 ON c1.cl = s2.cl AND c1.i = v.i),
      |rinit AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
      |  FROM (SELECT DISTINCT id FROM rv ORDER BY id LIMIT 4)),
      |rc0 AS (SELECT rv.sub, rinit.cl, rv.j, rv.x AS c FROM rv JOIN rinit USING (id)),
      |ra1 AS (SELECT rv.id, rv.sub, c.cl, CAST(SUM((rv.x - c.c) * (rv.x - c.c)) AS BIGINT) AS dist
      |  FROM rv JOIN rc0 c ON c.sub = rv.sub AND c.j = rv.j GROUP BY 1, 2, 3),
      |rs1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
      |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM ra1) WHERE rn = 1),
      |pl AS (SELECT cl AS cc FROM (SELECT c1.cl, CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS cdist
      |    FROM c1 JOIN (SELECT i, x FROM v WHERE id = 0) p ON p.i = c1.i GROUP BY 1)
      |  ORDER BY cdist, cl LIMIT 2),
      |prx AS (SELECT c1.cl AS cc, CAST((c1.i - 1) // 16 AS INTEGER) AS sub,
      |    CAST((c1.i - 1) % 16 AS INTEGER) AS j, p.x - c1.c AS rx
      |  FROM c1 JOIN pl ON pl.cc = c1.cl
      |  JOIN (SELECT i, x FROM v WHERE id = 0) p ON p.i = c1.i),
      |tbl AS (SELECT prx.cc, rc0.sub, rc0.cl, CAST(SUM((prx.rx - rc0.c) * (prx.rx - rc0.c)) AS BIGINT) AS pdist
      |  FROM prx JOIN rc0 ON rc0.sub = prx.sub AND rc0.j = prx.j GROUP BY 1, 2, 3),
      |cand AS (SELECT rs1.id, s2.cl AS cc, rs1.sub, rs1.cl
      |  FROM rs1 JOIN s2 ON s2.id = rs1.id
      |  WHERE s2.cl IN (SELECT cc FROM pl) AND rs1.id <> 0),
      |adc AS (SELECT cand.id AS vec_id, CAST(SUM(tbl.pdist) AS BIGINT) AS dist_u
      |  FROM cand JOIN tbl ON tbl.cc = cand.cc AND tbl.sub = cand.sub AND tbl.cl = cand.cl
      |  GROUP BY 1)
      |SELECT vec_id, dist_u FROM adc ORDER BY dist_u, vec_id LIMIT 10""".stripMargin

  /** Persisted LSH band index over the "historical" corpus slice
    * (doc_id % 10 != 0) for dd11, via the shared [[corpusFixture]]
    * discipline. */
  private def bandIndexLoaded(s: SparkSession, d: String): String =
    corpusFixture(d, "documents", "bandidx", formatVer = "d") { tmp =>
      TextDedup.saveBandIndex(
        t(s, d).documents.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        tmp.toString)
    }

  /** The dHash fixture corpus as an (id, dhash) frame — real
    * listing -> PNG decode -> hash, ids recovered from the fixture
    * file names (the mm01 idx discipline). Shared by mm03/mm04. */
  private def dhashFixtureHashes(s: SparkSession): DataFrame = {
    import graft.multimodal.{ImageHash, MediaFixture, Multimodal}
    val dir = MediaFixture.ensureDhash()
    val imgs = Multimodal.readMedia(s, dir, "image/png", Some("*.png"))
    val ids = imgs.toDF.select(col("media_id"),
      regexp_extract(element_at(col("meta"), lit("path")), "dh_(\\d+)\\.png", 1)
        .cast("int").as("id"))
    ImageHash.hashImages(imgs).toDF.join(ids, "media_id").select("id", "dhash")
  }

  /** Persisted dHash band index over the "historical" fixture images
    * (all but 1/2) for mm04. Fixture-derived and scale-independent, so
    * the version ties to the media fixture version + index format
    * rather than a source-table mtime. */
  private def dhashIndexLoaded(s: SparkSession): String =
    // version DERIVED from the media fixture's own version (suffix = the
    // index format generation), so one fixture bump invalidates both the
    // image cache and this index cache (r17 advisory)
    graft.Fixtures.ensure("media_dhash_idx",
      s"${graft.multimodal.MediaFixture.DhashVersion}b") { tmp =>
      graft.multimodal.ImageHash.saveDhashIndex(
        dhashFixtureHashes(s).filter(!col("id").isin(1, 2)), tmp.toString)
    }

  /** dd13/mm08/au05's three-generation index lifecycle (r19 directive
    * #1): day-0 built with save, day-1 APPENDED under the witness, the
    * tree compacted — so the day-2 oracle query exercises appended
    * bands (and, for the segment form, appended counts) plus the
    * maintained file layout, gated by the save-once entry's oracle
    * VERBATIM (append + compaction must be answer-invariant). */
  private def bandIndexAppended(s: SparkSession, d: String): String =
    corpusFixture(d, "documents", "bandidxapp", formatVer = "a") { tmp =>
      val docs = t(s, d).documents.select("doc_id", "text")
      TextDedup.saveBandIndex(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5),
        tmp.toString)
      TextDedup.appendToBandIndex(docs.filter(col("doc_id") % 10 === 5),
        tmp.toString)
      val stats = TextDedup.compactBandIndex(s, tmp.toString)
      require(stats.compacted && stats.filesAfter < stats.filesBefore,
        s"dd13 fixture expected a real compaction, got $stats")
    }

  /** mm08's appended dHash index: day-0 = all but images 0/1/2,
    * day-1 = image 0 appended (the hub of every mm04 pair — the
    * oracle answer EXISTS only if the appended rows are really in the
    * index), maintenance compaction best-effort (tiny fixture may
    * already be compact; dd13 asserts the collapse). */
  private def dhashIndexAppended(s: SparkSession): String =
    graft.Fixtures.ensure("media_dhash_idx_app",
      s"${graft.multimodal.MediaFixture.DhashVersion}a") { tmp =>
      val h = dhashFixtureHashes(s)
      graft.multimodal.ImageHash.saveDhashIndex(
        h.filter(!col("id").isin(0, 1, 2)), tmp.toString)
      graft.multimodal.ImageHash.appendToDhashIndex(
        h.filter(col("id") === 0), tmp.toString)
      graft.multimodal.ImageHash.compactDhashIndex(s, tmp.toString)
    }

  /** The afp fixture corpus as an (id, afp) frame — real listing ->
    * WAV decode -> fingerprint, ids recovered from the fixture file
    * names (the dhashFixtureHashes discipline). Shared by au01/st16. */
  private def afpFixtureHashes(s: SparkSession): DataFrame = {
    import graft.multimodal.{AudioHash, MediaFixture, Multimodal}
    val dir = MediaFixture.ensureAfp()
    val clips = Multimodal.readMedia(s, dir, "audio/wav", Some("*.wav"))
    val ids = clips.toDF.select(col("media_id"),
      regexp_extract(element_at(col("meta"), lit("path")), "afp_(\\d+)\\.wav", 1)
        .cast("int").as("id"))
    AudioHash.hashAudio(clips).toDF.join(ids, "media_id").select("id", "afp")
  }

  /** The afp SEGMENT fixture as an (id, seg_idx, afp) frame — real
    * listing -> WAV decode -> per-segment fingerprint, ids from the
    * fixture file names (the dhashVidFixtureFrames discipline). au03's
    * input. */
  private def afpSegFixtureHashes(s: SparkSession): DataFrame = {
    import graft.multimodal.{AudioHash, MediaFixture, Multimodal}
    val dir = MediaFixture.ensureAfpSeg()
    val clips = Multimodal.readMedia(s, dir, "audio/wav", Some("*.wav"))
    val ids = clips.toDF.select(col("media_id"),
      regexp_extract(element_at(col("meta"), lit("path")), "afps_(\\d+)\\.wav", 1)
        .cast("int").as("id"))
    AudioHash.segmentHashes(clips, MediaFixture.AfpSegFrames).toDF
      .join(ids, "media_id").select("id", "seg_idx", "afp")
  }

  /** Persisted segment band index over the "historical" segment clips
    * (0/3/4) for au04 — version DERIVED from the segment fixture's own
    * version (the r17 advisory: one bump invalidates both caches). */
  private def afpSegIndexLoaded(s: SparkSession): String =
    graft.Fixtures.ensure("media_afp_seg_idx",
      s"${graft.multimodal.MediaFixture.AfpSegVersion}b") { tmp =>
      graft.multimodal.AudioHash.saveSegmentIndex(
        afpSegFixtureHashes(s).filter(col("id").isin(0, 3, 4)), tmp.toString)
    }

  /** au05's appended SEGMENT index: day-0 = clips 3/4, day-1 = clip 0
    * appended (both its band rows AND its counts/ rows — the fraction
    * gate for every (0, batch) pair reads clip 0's length from the
    * APPENDED counts, so a dropped counts append breaks the oracle),
    * maintenance compaction best-effort. */
  private def afpSegIndexAppended(s: SparkSession): String =
    graft.Fixtures.ensure("media_afp_seg_idx_app",
      s"${graft.multimodal.MediaFixture.AfpSegVersion}a") { tmp =>
      val segs = afpSegFixtureHashes(s)
      graft.multimodal.AudioHash.saveSegmentIndex(
        segs.filter(col("id").isin(3, 4)), tmp.toString)
      graft.multimodal.AudioHash.appendToSegmentIndex(
        segs.filter(col("id") === 0), tmp.toString)
      graft.multimodal.AudioHash.compactSegmentIndex(s, tmp.toString)
    }

  /** The dHash video fixture as an (id, frame_idx, dhash) frame — real
    * listing -> GIF frame decode -> per-frame hash, ids from the
    * fixture file names. Shared by mm05/mm06/st17. */
  private def dhashVidFixtureFrames(s: SparkSession): DataFrame = {
    import graft.multimodal.{ImageHash, MediaFixture, Multimodal}
    val dir = MediaFixture.ensureDhash()
    val vids = Multimodal.readMedia(s, dir, "image/gif", Some("*.gif"))
    val ids = vids.toDF.select(col("media_id"),
      regexp_extract(element_at(col("meta"), lit("path")), "dhv_(\\d+)\\.gif", 1)
        .cast("int").as("id"))
    ImageHash.hashFrames(vids).toDF
      .join(ids, "media_id").select("id", "frame_idx", "dhash")
  }

  /** Persisted frame band index over the "historical" dHash videos
    * (0/3/4/6) for mm07 — version DERIVED from the media fixture's own
    * version (the r17 advisory discipline). */
  private def dhashVidIndexLoaded(s: SparkSession): String =
    graft.Fixtures.ensure("media_dhash_vid_idx",
      s"${graft.multimodal.MediaFixture.DhashVersion}b") { tmp =>
      graft.multimodal.ImageHash.saveFrameIndex(
        dhashVidFixtureFrames(s).filter(col("id").isin(0, 3, 4, 6)),
        tmp.toString)
    }

  /** mm05's closed-form pair oracle, shared VERBATIM with its
    * streaming twin st17 (the DhashPairsOracle discipline). */
  private val DhashVidPairsOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(n_matched AS BIGINT) AS n_matched
      |FROM (VALUES (0, 1, 3), (0, 2, 3), (1, 2, 3))
      |t(idx_a, idx_b, n_matched) ORDER BY idx_a, idx_b""".stripMargin

  /** Persisted afp band index over the "historical" fixture clips
    * (0/1/3) for au02 — version DERIVED from the media fixture's own
    * version (the r17 advisory: one bump invalidates both caches). */
  private def afpIndexLoaded(s: SparkSession): String =
    graft.Fixtures.ensure("media_afp_idx",
      s"${graft.multimodal.MediaFixture.AfpVersion}b") { tmp =>
      graft.multimodal.AudioHash.saveAfpIndex(
        afpFixtureHashes(s).filter(col("id").isin(0, 1, 3)), tmp.toString,
        nBands = 8)
    }

  /** au01's closed-form pair oracle, shared VERBATIM with its
    * streaming twin st16 (the DhashPairsOracle discipline): DC and
    * gain copies of the period-8 clip at hamming 0, the
    * one-window-swapped clip at exactly 5 bits from each. */
  private val AfpPairsOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(hamming AS INTEGER) AS hamming
      |FROM (VALUES (0, 1, 0), (0, 2, 0), (0, 5, 5), (1, 2, 0), (1, 5, 5), (2, 5, 5))
      |t(idx_a, idx_b, hamming) ORDER BY idx_a, idx_b""".stripMargin

  /** au03's closed-form offset-sweep oracle (derivation in the
    * MediaFixture afp-segment comment), shared VERBATIM with its
    * streaming twin st19 (the DhashPairsOracle discipline). */
  private val AfpOffsetOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(n_matched AS BIGINT) AS n_matched, CAST(shift AS INTEGER) AS shift
      |FROM (VALUES (0, 1, 3, 0), (0, 2, 2, 1), (0, 4, 3, 0), (1, 2, 2, 1),
      |  (1, 4, 3, 0), (2, 4, 2, -1))
      |t(idx_a, idx_b, n_matched, shift) ORDER BY idx_a, idx_b""".stripMargin

  /** au04's closed-form incremental-sweep oracle — au03's VALUES minus
    * exactly the all-history pair (0,4) — shared VERBATIM with its
    * streaming twin st20 (the DhashPairsOracle discipline). */
  private val AfpOffsetIncOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(n_matched AS BIGINT) AS n_matched, CAST(shift AS INTEGER) AS shift
      |FROM (VALUES (0, 1, 3, 0), (0, 2, 2, 1), (1, 2, 2, 1), (1, 4, 3, 0),
      |  (2, 4, 2, -1))
      |t(idx_a, idx_b, n_matched, shift) ORDER BY idx_a, idx_b""".stripMargin

  /** tp01's curation derivation (exact dedup -> stopword language ID ->
    * composite quality -> gates), shared VERBATIM with the cross-modal
    * tp08 (one SQL text, the BandCte discipline). Ends at CTE `c` =
    * (doc_id, n_tokens, pred_lang, quality) pre-gate. */
  private val CurateCte =
    """WITH sv AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM sv),
      |r AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |  SUM(CASE WHEN w = 'the' THEN 1 ELSE 0 END) / COUNT(*) AS r_the,
      |  SUM(CASE WHEN w = 'a' THEN 1 ELSE 0 END) / COUNT(*) AS r_a,
      |  SUM(CASE WHEN w IN ('the','a') THEN 1 ELSE 0 END) / COUNT(*) AS stop0
      |  FROM tok WHERE w <> '' GROUP BY doc_id),
      |c AS (SELECT doc_id, n_tokens,
      |  CASE WHEN r_the >= 0.05 THEN 'en' WHEN r_a >= 0.05 THEN 'es'
      |       WHEN r_the >= 0.02 THEN 'de' WHEN r_a >= 0.02 THEN 'fr' ELSE 'zh' END AS pred_lang,
      |  ROUND(LEAST(1.0, n_tokens / 100.0) * (1.0 - stop0) * 10000) / 10000 + 0 AS quality
      |  FROM r)""".stripMargin

  /** The interleaved image corpus for tp08: BOTH media fixture sets —
    * the dHash near-dup set (ids 0-5) and the flat mm01 images (ids
    * 10-17) — hashed and measured through the real imageio decode.
    * Flat images hash to 0L, colliding with the reversed gradients
    * across fixture sets (the realistic crawl case tp08's oracle
    * pins). */
  private def crossModalImages(s: SparkSession): DataFrame = {
    import graft.multimodal.{ImageHash, MediaFixture, Multimodal}
    def side(dir: String, re: String, offset: Int): DataFrame = {
      val items = Multimodal.readMedia(s, dir, "image/png", Some("*.png"))
      val ids = items.toDF.select(col("media_id"),
        (regexp_extract(element_at(col("meta"), lit("path")), re, 1)
          .cast("int") + offset).as("id"))
      ImageHash.hashImages(items).toDF
        .join(ids, "media_id")
        .join(Multimodal.decodeImages(items, Multimodal.Decoders.imageio).toDF
          .select("media_id", "width", "height"), "media_id")
        .select("id", "dhash", "width", "height")
    }
    side(MediaFixture.ensureDhash(), "dh_(\\d+)\\.png", 0)
      .unionAll(side(MediaFixture.ensure(), "img_(\\d+)\\.png", 10))
  }

  /** The afp fixture as (id, afp, rms) rows for tp09's audio branch:
    * fingerprints + the REAL decoded RMS feature (the silence gate's
    * input). Square-wave amplitudes are dyadic, so rms is exact —
    * 0.25/0.5 for the signal clips, 0 for the silent one. */
  private def crossModalAudio(s: SparkSession): DataFrame = {
    import graft.multimodal.{AudioHash, MediaFixture, Multimodal}
    val dir = MediaFixture.ensureAfp()
    val clips = Multimodal.readMedia(s, dir, "audio/wav", Some("*.wav"))
    val ids = clips.toDF.select(col("media_id"),
      regexp_extract(element_at(col("meta"), lit("path")), "afp_(\\d+)\\.wav", 1)
        .cast("int").as("id"))
    AudioHash.hashAudio(clips).toDF
      .join(ids, "media_id")
      .join(Multimodal.decodeAudio(clips).toDF.select("media_id", "rms"),
        "media_id")
      .select("id", "afp", "rms")
  }

  /** tp09's full three-modality survivor oracle — tp01's curation CTE
    * plus the closed-form image/audio survivor VALUES — shared VERBATIM
    * with its streaming twin st18 (the DhashPairsOracle discipline). */
  private val CrossModalFullOracle = CurateCte +
    """
    |SELECT modality, item_id FROM (
    |  SELECT 'text' AS modality, CAST(doc_id AS BIGINT) AS item_id FROM c
    |  WHERE pred_lang IN ('en','de','fr') AND quality >= 0.5 AND n_tokens >= 20
    |  UNION ALL
    |  SELECT 'image' AS modality, CAST(x AS BIGINT) AS item_id
    |  FROM (VALUES (0), (3), (5)) v(x)
    |  UNION ALL
    |  SELECT 'audio' AS modality, CAST(y AS BIGINT) AS item_id
    |  FROM (VALUES (0), (3)) w(y)) u
    |ORDER BY modality, item_id""".stripMargin

  /** mm03's closed-form pair oracle, shared VERBATIM with its
    * streaming twin st15 (the Sd02Oracle discipline — one SQL text, so
    * a fixture change cannot silently desynchronize the gates). */
  private val DhashPairsOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(hamming AS INTEGER) AS hamming
      |FROM (VALUES (0, 1, 0), (0, 2, 1), (1, 2, 1), (3, 4, 0))
      |t(idx_a, idx_b, hamming) ORDER BY idx_a, idx_b""".stripMargin

  /** Shared oracle CTE: distinct 3-gram shingles per document. */
  private val ShingleCte =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, unnest([t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1, greatest(len(t)-1,1))]) AS s
      |    FROM toks) q)""".stripMargin

  /** sd02's full-derivation oracle, shared VERBATIM with its
    * streaming twin st14 (one SQL text, the [[BandCte]] discipline —
    * a derivation change cannot silently desynchronize the gates):
    * historical 2-iteration Lloyd with 4-smallest-id init, batch
    * argmin against the after-one-update centroids, corpus + lower-id
    * batch dominance joins. */
  private val Sd02Oracle =
    """WITH h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id % 10 <> 0),
      |nb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id % 10 = 0),
      |v AS (SELECT vec_id AS id, i,
      |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 <> 0),
      |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
      |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
      |c0 AS (SELECT init.cl, v.i, v.x AS c FROM v JOIN init USING (id)),
      |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
      |s1 AS (SELECT id, cl FROM (SELECT id, cl,
      |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
      |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
      |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
      |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
      |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
      |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
      |s2 AS (SELECT id, cl FROM (SELECT id, cl,
      |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
      |vb AS (SELECT vec_id AS id, i,
      |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 = 0),
      |ab AS (SELECT vb.id, c.cl, CAST(SUM((vb.x - c.c) * (vb.x - c.c)) AS BIGINT) AS dist
      |  FROM vb JOIN c1 c ON c.i = vb.i GROUP BY 1, 2),
      |sb AS (SELECT id, cl FROM (SELECT id, cl,
      |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM ab) WHERE rn = 1),
      |wc AS (SELECT s2.id AS vec_id, s2.cl AS cluster, h.e FROM s2 JOIN h ON h.vec_id = s2.id),
      |wb AS (SELECT sb.id AS vec_id, sb.cl AS cluster, nb.e FROM sb JOIN nb ON nb.vec_id = sb.id),
      |dup AS (
      |  SELECT DISTINCT b.vec_id FROM wb b JOIN wc c ON c.cluster = b.cluster
      |  WHERE list_dot_product(b.e, c.e) /
      |    (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(c.e, c.e))) >= 0.3
      |  UNION
      |  SELECT DISTINCT a.vec_id FROM wb a JOIN wb b2
      |    ON a.cluster = b2.cluster AND b2.vec_id < a.vec_id
      |  WHERE list_dot_product(a.e, b2.e) /
      |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b2.e, b2.e))) >= 0.3)
      |SELECT vec_id, cluster FROM wb
      |WHERE vec_id NOT IN (SELECT vec_id FROM dup)
      |ORDER BY vec_id""".stripMargin

  /** Shared oracle CTE: [[ShingleCte]] + 16-seed Carter-Wegman minhash
    * signatures + 4-row band keys — ONE SQL text for every banding
    * oracle (dd02, dd11, st09), so a banding-formula change cannot
    * silently desynchronize one of them. */
  private val BandCte = ShingleCte +
    """,
      |seeds AS (SELECT unnest(range(16)) AS seed),
      |h AS (
      |  SELECT doc_id, s, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
      |         ('0x' || substr(md5(s), 13, 12))::BIGINT AS h2 FROM sh),
      |sig AS (
      |  SELECT doc_id, seed, MIN((h1 + seed * h2) % 281474976710656) AS sig
      |  FROM h CROSS JOIN seeds GROUP BY doc_id, seed),
      |band AS (
      |  SELECT doc_id, seed // 4 AS band_id, string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS band_key
      |  FROM sig GROUP BY doc_id, seed // 4)""".stripMargin

  /** pq08's full batched-IVFADC recomputation (3 probes x top-10),
    * shared VERBATIM with its streaming twin st21 (the BandIncOracle
    * discipline: ANN-on-ingest must answer exactly like the batch
    * searcher on any chunking). */
  private val IvfPqBatchOracle = """WITH v AS (SELECT vec_id AS id, i,
    |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
    |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
    |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
    |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
    |c0 AS (SELECT init.cl, v.i, v.x AS c FROM v JOIN init USING (id)),
    |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
    |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
    |s1 AS (SELECT id, cl FROM (SELECT id, cl,
    |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
    |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
    |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
    |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
    |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
    |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
    |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
    |s2 AS (SELECT id, cl FROM (SELECT id, cl,
    |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
    |rv AS (SELECT v.id, CAST((v.i - 1) // 16 AS INTEGER) AS sub,
    |    CAST((v.i - 1) % 16 AS INTEGER) AS j, v.x - c1.c AS x
    |  FROM v JOIN s2 ON s2.id = v.id JOIN c1 ON c1.cl = s2.cl AND c1.i = v.i),
    |rinit AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
    |  FROM (SELECT DISTINCT id FROM rv ORDER BY id LIMIT 4)),
    |rc0 AS (SELECT rv.sub, rinit.cl, rv.j, rv.x AS c FROM rv JOIN rinit USING (id)),
    |ra1 AS (SELECT rv.id, rv.sub, c.cl, CAST(SUM((rv.x - c.c) * (rv.x - c.c)) AS BIGINT) AS dist
    |  FROM rv JOIN rc0 c ON c.sub = rv.sub AND c.j = rv.j GROUP BY 1, 2, 3),
    |rs1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
    |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM ra1) WHERE rn = 1),
    |pb AS (SELECT id AS pid, i, x FROM v WHERE id IN (0, 1, 2)),
    |pcd AS (SELECT pb.pid, c1.cl, CAST(SUM((pb.x - c1.c) * (pb.x - c1.c)) AS BIGINT) AS cdist
    |  FROM c1 JOIN pb ON pb.i = c1.i GROUP BY 1, 2),
    |pl AS (SELECT pid, cl AS cc FROM (SELECT pid, cl,
    |    row_number() OVER (PARTITION BY pid ORDER BY cdist, cl) AS rn FROM pcd) WHERE rn <= 2),
    |prx AS (SELECT pb.pid, c1.cl AS cc, CAST((c1.i - 1) // 16 AS INTEGER) AS sub,
    |    CAST((c1.i - 1) % 16 AS INTEGER) AS j, pb.x - c1.c AS rx
    |  FROM c1 JOIN pl ON pl.cc = c1.cl JOIN pb ON pb.pid = pl.pid AND pb.i = c1.i),
    |tbl AS (SELECT prx.pid, prx.cc, rc0.sub, rc0.cl,
    |    CAST(SUM((prx.rx - rc0.c) * (prx.rx - rc0.c)) AS BIGINT) AS pdist
    |  FROM prx JOIN rc0 ON rc0.sub = prx.sub AND rc0.j = prx.j GROUP BY 1, 2, 3, 4),
    |cand AS (SELECT pl.pid, rs1.id, s2.cl AS cc, rs1.sub, rs1.cl
    |  FROM rs1 JOIN s2 ON s2.id = rs1.id
    |  JOIN pl ON pl.cc = s2.cl
    |  WHERE rs1.id <> pl.pid),
    |adc AS (SELECT cand.pid AS probe_id, cand.id AS vec_id, CAST(SUM(tbl.pdist) AS BIGINT) AS dist_u
    |  FROM cand JOIN tbl ON tbl.pid = cand.pid AND tbl.cc = cand.cc
    |    AND tbl.sub = cand.sub AND tbl.cl = cand.cl
    |  GROUP BY 1, 2),
    |rk AS (SELECT probe_id, vec_id, dist_u,
    |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dist_u, vec_id) AS INTEGER) AS rk
    |  FROM adc)
    |SELECT probe_id, vec_id, dist_u, rk FROM rk WHERE rk <= 10
    |ORDER BY probe_id, rk""".stripMargin

  /** dd11's incremental-candidates oracle (every band pair involving a
    * new-batch doc), shared VERBATIM with dd13 (the ix01 discipline:
    * append + compaction are answer-invariant, so one SQL text gates
    * the save-once index and the appended + compacted one — they
    * cannot silently desynchronize). */
  private val BandIncOracle = BandCte +
    """
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM band a JOIN band b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
      |ORDER BY doc_a, doc_b""".stripMargin

  /** mm04's closed-form incremental-pairs oracle, shared VERBATIM with
    * mm08 (the BandIncOracle discipline). */
  private val DhashIncOracle =
    """SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
      |  CAST(hamming AS INTEGER) AS hamming
      |FROM (VALUES (0, 1, 0), (0, 2, 1), (1, 2, 1))
      |t(idx_a, idx_b, hamming) ORDER BY idx_a, idx_b""".stripMargin

  /** Shared oracle CTE: the strictly-after funnel stage chain
    * (view → click → purchase, each stage's earliest time strictly
    * after the user's earliest completion of the previous stage) —
    * ONE SQL text for both funnel oracles (fn01, st08), the
    * [[BandCte]] discipline: a stage-formula change cannot silently
    * desynchronize one consumer. */
  private val FunnelCte =
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
      |    WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      |    WHERE e.event_type = 'click' GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      |    WHERE e.event_type = 'purchase' GROUP BY 1)""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // ---------------------------------------------------------------- Q26
    GraftQuery(
      "q26_similarity_brute",
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pe) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(p.pe, p.pe))) AS c
        |  FROM embeddings e CROSS JOIN probe p WHERE e.vec_id <> 0)
        |SELECT vec_id, ROUND(c * 10000) / 10000 + 0 AS score FROM s
        |ORDER BY c DESC, vec_id LIMIT 5""".stripMargin),
      (s, d) => Similarity.bruteForceTopK(t(s, d).embeddings, probeId = 0L, k = 5)),

    GraftQuery(
      "q26_similarity_ann",
      Some("""WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    concat(CASE WHEN embedding[1]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[2]>=0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[3]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[4]>=0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[5]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[6]>=0 THEN '1' ELSE '0' END) AS bucket
        |  FROM embeddings),
        |probe AS (SELECT e AS pe, bucket AS pb FROM b WHERE vec_id = 0),
        |s AS (
        |  SELECT b.vec_id,
        |    list_dot_product(b.e, p.pe) /
        |      (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(p.pe, p.pe))) AS c
        |  FROM b CROSS JOIN probe p WHERE b.bucket = p.pb AND b.vec_id <> 0)
        |SELECT vec_id, ROUND(c * 10000) / 10000 + 0 AS score FROM s
        |ORDER BY c DESC, vec_id LIMIT 5""".stripMargin),
      (s, d) => Similarity.annTopK(t(s, d).embeddings, probeId = 0L, k = 5, bits = 6)),

    GraftQuery(
      // IVF ANN with the q12/qs02 self-check pattern: the oracle-hashed
      // columns are the EXACT brute-force top-k (deterministic, DuckDB-
      // expressible); the IVF side — KMeans codebook, nProbe=10 of
      // nLists=16 inverted lists — is band-checked in Spark as
      // recall@5 >= 0.8 against that exact top-k. A clustering drift
      // that hurt recall flips recall_ok and fails the hash. The
      // synthetic embeddings are near-random (top-1 cosine ≈ 0.37), the
      // WORST regime for any partition-pruned ANN: measured recall@5 is
      // 5/5 at sf0.001/sf0.01/sf0.1 with these settings but degrades
      // sharply with fewer probes (3/5 at nProbe=8 on sf0.001, 2/5 at
      // nProbe=4 on sf0.01) — on clustered real-world embeddings the
      // same index reaches high recall at much smaller probe fractions
      // (IvfIndexSpec's recall-curve test shows the planted-cluster
      // behavior).
      "q26_similarity_ivf",
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pe) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(p.pe, p.pe))) AS c
        |  FROM embeddings e CROSS JOIN probe p WHERE e.vec_id <> 0)
        |SELECT vec_id, ROUND(c * 10000) / 10000 + 0 AS score, CAST(1 AS BOOLEAN) AS recall_ok
        |FROM s ORDER BY c DESC, vec_id LIMIT 5""".stripMargin),
      (s, d) => {
        val emb = t(s, d).embeddings
        // keep the UNROUNDED score through the crossJoin and sort on it:
        // the oracle orders by the raw cosine, and two distinct cosines
        // that round equal would otherwise order differently
        val brute = Similarity.bruteForceTopKRaw(emb, probeId = 0L, k = 5)
        val ivf = IvfIndex.build(emb.select(col("vec_id"), col("embedding")),
            nLists = 16, seed = 42L)
          .searchById(probeId = 0L, k = 5, nProbe = 10)
          .select(col("vec_id"))
        val metric = brute.select("vec_id").join(ivf, "vec_id")
          .agg((count(lit(1)) >= 4).as("recall_ok"))
        brute.crossJoin(broadcast(metric))
          .orderBy(col("score0").desc, col("vec_id"))
          .select(col("vec_id"), round4(col("score0")).as("score"), col("recall_ok"))
      }),

    GraftQuery(
      // Amortized-IVF search (VERDICT r12 #4): identical self-check
      // shape to q26_similarity_ivf — oracle hashes the EXACT
      // brute-force top-k, the IVF side is band-checked as recall@5 >=
      // 0.8 — but the searched index comes from IvfIndex.save/load via
      // [[ivfLoaded]], so the KMeans fit is paid once per dataset, not
      // per call. This is the entry that measures the production search
      // path (centroid table + nProbe pruned lists); q26_similarity_ivf
      // keeps measuring the one-shot build+search convenience.
      "q26_similarity_ivf_loaded",
      Some("""WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pe) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(p.pe, p.pe))) AS c
        |  FROM embeddings e CROSS JOIN probe p WHERE e.vec_id <> 0)
        |SELECT vec_id, ROUND(c * 10000) / 10000 + 0 AS score, CAST(1 AS BOOLEAN) AS recall_ok
        |FROM s ORDER BY c DESC, vec_id LIMIT 5""".stripMargin),
      (s, d) => {
        val emb = t(s, d).embeddings
        val brute = Similarity.bruteForceTopKRaw(emb, probeId = 0L, k = 5)
        val ivf = ivfLoaded(s, d)
          .searchById(probeId = 0L, k = 5, nProbe = 10)
          .select(col("vec_id"))
        val metric = brute.select("vec_id").join(ivf, "vec_id")
          .agg((count(lit(1)) >= 4).as("recall_ok"))
        brute.crossJoin(broadcast(metric))
          .orderBy(col("score0").desc, col("vec_id"))
          .select(col("vec_id"), round4(col("score0")).as("score"), col("recall_ok"))
      }),

    GraftQuery(
      // Int8 scalar-quantized cosine search (Similarity.quantized /
      // quantizedTopK): per-vector symmetric int8 codes, FLOOR(x/max*127
      // + 0.5) — identical arithmetic in both engines — and cosine over
      // the codes (scales cancel; dot products are exact integer sums).
      // Unlike the ANN/IVF entries this is bit-reproducible, so it gets
      // the full hash gate, not a recall band.
      "sq01_quantized_cosine",
      Some("""WITH qv AS (
        |  SELECT vec_id,
        |    CASE WHEN ma = 0 THEN e ELSE list_transform(e, x -> FLOOR(x / ma * 127 + 0.5)) END AS q
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS ma
        |        FROM embeddings) b),
        |probe AS (SELECT q AS pq FROM qv WHERE vec_id = 0),
        |s AS (
        |  SELECT qv.vec_id,
        |    list_dot_product(qv.q, p.pq) /
        |      (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(p.pq, p.pq))) AS c
        |  FROM qv CROSS JOIN probe p WHERE qv.vec_id <> 0)
        |SELECT vec_id, ROUND(c * 10000) / 10000 + 0 AS score FROM s
        |ORDER BY c DESC, vec_id LIMIT 5""".stripMargin),
      (s, d) => Similarity.quantizedTopK(t(s, d).embeddings, probeId = 0L, k = 5)),

    // ---------------------------------------------------------------- Q27
    GraftQuery(
      "q27_text_wordcount",
      Some("SELECT w, COUNT(*) AS n FROM (SELECT unnest(string_split(lower(text), ' ')) AS w " +
        "FROM documents) q WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20"),
      (s, d) => TextAnalysis.tokenStream(t(s, d).documents)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(20)),

    // ---------------------------------------------------------------- Q29 (batch-checkable forms)
    GraftQuery(
      // session_window is the same grouping expression used under
      // readStream + watermark; oracle = gaps-and-islands. New session
      // when gap >= 10 min, matching Spark's [start, start+gap) windows.
      "q29_session_window",
      Some("""WITH g AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
        |  FROM (SELECT user_id, event_id, ts,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) q)
        |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n
        |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""".stripMargin),
      (s, d) => t(s, d).events
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("session_start"), col("n"))
        .orderBy("user_id", "session_start")),

    GraftQuery(
      // The STREAMING half of Q29, driver-visible: the same events
      // replayed as watermark-bounded micro-batches (with deterministic
      // late arrivals) through the streaming session_window operator in
      // append mode must converge to the identical gaps-and-islands
      // result the batch q29 oracle computes. See
      // [[graft.streaming.StreamReplay]] for the replay protocol.
      "st01_stream_session_replay",
      Some("""WITH g AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
        |  FROM (SELECT user_id, event_id, ts,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) q)
        |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n
        |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.sessionReplay(
        s, t(s, d).events.select("user_id", "event_id", "ts"),
        // 4 replay chunks (r16 st02/st03 precedent): output is
        // chunking-invariant by contract, the 6-chunk displacement
        // coverage lives in StreamReplaySpec, and each micro-batch
        // costs fixed state-store machinery.
        nChunks = 4)),

    GraftQuery(
      // The second stateful streaming operator made driver-visible: the
      // stream-stream INTERVAL JOIN (dual watermarks, banded condition —
      // the state-GC shape from SURVEY Q29's family) replayed over
      // events split by event_id parity, against the batch interval-join
      // oracle. The oracle compares at microsecond precision
      // (CAST(ts AS TIMESTAMP) truncates DuckDB's nanos exactly like the
      // engine's nanos->micros conversion in Tables.events).
      "st02_stream_interval_join",
      Some("""SELECT l.user_id AS user_id, l.event_id AS l_event, r.event_id AS r_event
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |  AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
        |  AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
        |  AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        |ORDER BY user_id, l_event, r_event""".stripMargin),
      // 4 chunks (protocol minimum is 2): the dominant cost is
      // per-micro-batch planning of the dual-state join, and the
      // output is chunking-invariant BY CONTRACT (it must equal the
      // batch oracle under any feed order — that equality is what the
      // entry verifies; the 6-chunk displacement coverage stays in the
      // StreamReplaySpec unit replays).
      (s, d) => graft.streaming.StreamReplay.intervalJoinReplay(
        s, t(s, d).events.select("user_id", "event_id", "ts"), nChunks = 4)),

    GraftQuery(
      // The OUTER half of the stream-stream interval join (st03): even
      // events with no odd partner inside the band must emit exactly
      // once, null-padded, when the watermark closes their band. The
      // oracle is the batch LEFT JOIN over parity-filtered subqueries
      // (parity must filter the LEFT side BEFORE the join — inside the
      // ON clause it would merely unmatch, not remove, odd left rows).
      // NULLS FIRST pins DuckDB's sort to Spark's null ordering.
      "st03_stream_interval_join_outer",
      Some("""SELECT l.user_id AS user_id, l.event_id AS l_event, r.event_id AS r_event
        |FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
        |LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
        |  ON l.user_id = r.user_id
        |  AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
        |  AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        |ORDER BY user_id, l_event, r_event NULLS FIRST""".stripMargin),
      // 4 chunks — same rationale as st02.
      (s, d) => graft.streaming.StreamReplay.intervalJoinReplay(
        s, t(s, d).events.select("user_id", "event_id", "ts"),
        joinType = "leftOuter", nChunks = 4)),

    GraftQuery(
      // STREAMING dedup made driver-visible (st04): the incremental half
      // of the dedup family — an at-least-once replay of events where
      // only the FIRST arrival per (user_id, hour-bucket) may survive,
      // run through dropDuplicatesWithinWatermark with the horizon sized
      // past the event span, so the streaming result must equal batch
      // DISTINCT exactly: a duplicate emission, a key lost to premature
      // state eviction, or a dropped late arrival each break the hash.
      // See [[graft.streaming.StreamReplay.dedupReplay]].
      "st04_stream_dedup",
      Some("""SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_bucket
        |FROM events GROUP BY user_id, hour_bucket
        |ORDER BY user_id, hour_bucket""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.dedupReplay(
        s, t(s, d).events.select("user_id", "event_id", "ts"),
        nChunks = 4)),

    GraftQuery(
      // Incremental dedup against a PERSISTED band index (dd11): the
      // nightly-ingest production shape — the historical corpus
      // (doc_id % 10 != 0) costs one index read (fixture-cached
      // TextDedup.saveBandIndex, q26_ivf_loaded discipline); only the
      // new batch (doc_id % 10 == 0) is fingerprinted. Candidates =
      // (indexed x new) + (new x new), never (indexed x indexed). The
      // oracle recomputes the full band self-join and keeps exactly the
      // pairs involving a new doc.
      "dd11_incremental_candidates",
      Some(BandIncOracle),
      (s, d) => TextDedup.incrementalCandidatePairs(
          t(s, d).documents.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          bandIndexLoaded(s, d))
        .orderBy("doc_a", "doc_b")),

    GraftQuery(
      // Band-index APPEND lifecycle (dd13 — r19 directive #1): the
      // day-2 nightly query against an index whose day-1 slice entered
      // via appendToBandIndex (banded with the index's OWN persisted
      // parameters, bucketed-appended under the witness, meta
      // re-blessed last) and whose tree was then COMPACTED back to one
      // file per bucket through the bucketed writer (directive #2; the
      // fixture asserts the file collapse). Day-2 candidates must be
      // IDENTICAL to dd11's against a save-once index over the same
      // corpus — append and compaction are answer-invariant — so
      // dd11's oracle gates this VERBATIM; history (day-0 × day-1)
      // pairs never re-emit because the index side never self-joins.
      "dd13_band_index_append",
      Some(BandIncOracle),
      (s, d) => TextDedup.incrementalCandidatePairs(
          t(s, d).documents.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          bandIndexAppended(s, d))
        .orderBy("doc_a", "doc_b")),

    GraftQuery(
      // Streaming near-dup detection ON INGEST (st09): the whole
      // minhash fingerprint pipeline — zero-shuffle signatures + the
      // SHARED banding projection (TextDedup.bandRows) — runs inside
      // the streaming query, with band-bucket keyed state
      // (StatefulOps.lshCandidateStream) emitting each candidate pair
      // when its second member arrives. The oracle is the BATCH band
      // self-join (the dd02 candidate stage in DuckDB SQL):
      // arrival-order-invariance means the distinct streamed pairs
      // equal the batch candidates on any chunking.
      "st09_stream_lsh_candidates",
      Some(BandCte +
        """
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM band a JOIN band b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.lshCandidateReplay(
        s, t(s, d).documents.select("doc_id", "text"), nChunks = 4)),

    GraftQuery(
      // The CUSTOM-KEYED-STATE operator made driver-visible (st05):
      // flatMapGroupsWithState CDC view maintenance
      // (StatefulOps.latestByKeyStream) replayed with late-displaced
      // versions. The harness THROWS unless every key's Update
      // changelog is strictly version-increasing across micro-batches
      // (a regressing changelog is the bug a CDC sink observes even
      // when the final state heals), then the final state per
      // (user_id, event_type) must equal the batch winner — max
      // event_id — which is this oracle.
      "st05_stream_latest_replay",
      Some("""SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        |  FROM events) q
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.latestByKeyReplay(
        s, t(s, d).events.select("user_id", "event_type", "event_id"),
        nChunks = 4)),

    GraftQuery(
      // Append-mode custom state (st06): per-key admission limiting
      // (StatefulOps.rateLimit) carries the admitted count across
      // micro-batches. WHICH events pass is arrival-order-dependent;
      // the admitted COUNT is not — LEAST(total, k) exactly — so the
      // count is the hashed surface. State loss between batches
      // over-admits; an over-eager limiter under-admits; both break it.
      "st06_stream_rate_limit",
      Some("""SELECT user_id, CAST(LEAST(COUNT(*), 5) AS BIGINT) AS n_admitted
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.rateLimitReplay(
        s, t(s, d).events.select("user_id", "value", "event_id"), maxPerKey = 5L,
        nChunks = 4)),

    GraftQuery(
      // Deterministic bounded admission (st07, VERDICT r9 #8): st06's
      // count-only oracle cannot see WHICH rows were admitted, so an
      // implementation admitting the wrong k records still passes it.
      // StatefulOps.smallestKByKey makes the admitted SET itself
      // deterministic (k smallest event_ids win, arrival-order-
      // invariant via an Update changelog that the harness asserts
      // only ever improves), so the full row set hashes against the
      // batch ROW_NUMBER oracle.
      "st07_stream_topk_admission",
      Some("""SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events) q
        |WHERE rn <= 5 ORDER BY user_id, event_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.smallestKReplay(
        s, t(s, d).events.select("user_id", "event_id"), k = 5, nChunks = 4)),

    GraftQuery(
      // Streaming funnel (st08): the stream half of fn01 — per-user
      // deepest ordered stage (view → click → purchase, strictly
      // after), maintained EXACTLY in keyed state under the replay's
      // displaced late arrivals (a late earlier-stage event must
      // re-qualify later-stage events that already arrived; the pruned
      // candidate frontier in StatefulOps.funnelStream is what makes
      // that exact). Final per-user stage hashes against the batch
      // strictly-after CTE chain.
      "st08_stream_funnel",
      Some(FunnelCte +
        """
        |SELECT u.user_id,
        |  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS INTEGER) AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.funnelReplay(
        s, t(s, d).events.select("user_id", "ts", "event_type", "event_id"),
        stages = Seq("view", "click", "purchase"), nChunks = 4)),

    GraftQuery(
      // Streaming funnel under event-time TTL (st10): the PRODUCTION
      // form of st08 — StatefulOps.funnelStreamTtl evicts per-user
      // state past an abandonment horizon (EventTimeTimeout), the
      // round-14 answer to unbounded keyed state at 100 TB key
      // cardinality. The replay derives horizon + watermark delay from
      // the feed's own span so every event is inside the horizon:
      // the TTL operator must then converge to the SAME strictly-after
      // batch oracle as st08 (eviction itself is spec-gated with an
      // observed numRowsTotal drop — StatefulTtlSpec — because a
      // shrinking-state run cannot equal any batch oracle).
      "st10_stream_funnel_ttl",
      Some(FunnelCte +
        """
        |SELECT u.user_id,
        |  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS INTEGER) AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.funnelTtlReplay(
        s, t(s, d).events.select("user_id", "ts", "event_type", "event_id"),
        stages = Seq("view", "click", "purchase"), nChunks = 4)),

    GraftQuery(
      "q29_sliding_window",
      Some("""SELECT w, COUNT(*) AS n FROM (
        |  SELECT unnest([time_bucket(INTERVAL 5 MINUTE, ts),
        |                 time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE]) AS w
        |  FROM events) q GROUP BY w ORDER BY w""".stripMargin),
      (s, d) => t(s, d).events
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w"), col("n"))
        .orderBy("w")),

    // ---------------------------------------------------------------- Q30
    GraftQuery(
      "q30_udf",
      Some("SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 3000 THEN 'low' " +
        "WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END AS band FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val band = udf((bal: Double) =>
          if (bal < 0) "neg" else if (bal < 3000) "low" else if (bal < 7000) "mid" else "high")
        t(s, d).customer
          .select(col("c_custkey"), band(col("c_acctbal")).as("band"))
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q30_udaf",
      Some("SELECT p_brand, ROUND(EXP(AVG(LN(p_retailprice))) * 100) / 100 + 0 AS geo_mean " +
        "FROM part GROUP BY p_brand ORDER BY p_brand"),
      (s, d) => {
        val gm = udaf(GeometricMean)
        t(s, d).part
          .groupBy("p_brand")
          .agg(round2(gm(col("p_retailprice"))).as("geo_mean"))
          .orderBy("p_brand")
      }),

    GraftQuery(
      // Typed generator (UDTF): 1 row -> N rows via Dataset.flatMap.
      "q30_udtf",
      Some("SELECT p_partkey, i - 1 AS pos, string_split(p_type, ' ')[i] AS w " +
        "FROM part, unnest(range(1, len(string_split(p_type, ' ')) + 1)) q(i) " +
        "ORDER BY p_partkey, pos"),
      (s, d) => {
        import s.implicits._
        t(s, d).part.select("p_partkey", "p_type").as[(Long, String)]
          .flatMap { case (k, ty) =>
            ty.split(' ').zipWithIndex.map { case (w, i) => (k, i, w) }
          }
          .toDF("p_partkey", "pos", "w")
          .orderBy("p_partkey", "pos")
      }),

    // ---------------------------------------------------------------- analytic extras
    GraftQuery(
      // as-of semantics via one keyed window pass (see operators.AsOfJoin)
      "aj02_asof_next_purchase",
      Some("""SELECT event_id, FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_id
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        t(s, d).events
          .select(col("event_id"),
            first(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
              .over(w).as("next_purchase_id"))
          .orderBy("event_id")
      }),

    GraftQuery(
      "aj01_asof_last_purchase",
      Some("""SELECT event_id, LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        t(s, d).events
          .select(col("event_id"),
            last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
              .over(w).as("last_purchase_id"))
          .orderBy("event_id")
      }),

    GraftQuery(
      // Banded interval join (operators.RangeJoin): clicks in the 10
      // minutes BEFORE each purchase, per user. The oracle is the
      // declarative key+range left join; the Spark side runs the banded
      // rewrite — right rows bucketed by time, left replicated to its ≤2
      // covering buckets, equi-join on (key, bucket) + residual range
      // filter — whose candidate set is bounded by a 2-window time slice
      // per key instead of the whole key group.
      "rj01_range_join",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, CAST(COUNT(c.ts) AS BIGINT) AS n_clicks
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = t(s, d).events
        graft.operators.RangeJoin.countInRange(
            ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
            ev.filter(col("event_type") === "click").select("user_id", "ts"),
            key = "user_id", leftId = "event_id", leftTs = "ts", rightTs = "ts",
            lowerUs = -600000000L, upperUs = 0L)
          .select(col("event_id"), col("n_matches").as("n_clicks"))
          .orderBy("event_id")
      }),

    GraftQuery(
      // Salted skew join (operators.SkewJoin): same result set as the
      // plain equi-join (the oracle), produced through a deterministic
      // hash salt on the big side + small-side replication — the manual
      // skew-mitigation shape for hot keys that AQE can't re-split.
      // Integer-cents accumulation keeps the double SUM order-independent
      // (same rationale as the TPC-H shapes).
      "sj01_salted_join",
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        graft.operators.SkewJoin.saltedJoin(
            tb.events, tb.customer.select("c_custkey", "c_mktsegment"),
            bigKey = "user_id", smallKey = "c_custkey",
            discriminator = "event_id", factor = 8)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100 + 0.5)).cast("long").as("value_cents"))
          .orderBy("c_mktsegment")
      }),

    GraftQuery(
      // Broadcast-Bloom semi-join reduction (operators.BloomJoin): the
      // big side is pruned by a broadcast Bloom filter over the small
      // side's keys BEFORE the exact semi join drops the false
      // positives — identical result to a plain semi join (the oracle
      // IS the plain semi join), with the shuffle paid only by rows
      // that might match.
      "bf01_bloom_semi_join",
      Some("""SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        graft.operators.BloomJoin.bloomSemiJoin(
            tb.lineitem, tb.orders.filter(col("o_orderpriority") === "1-URGENT"),
            bigKey = "l_orderkey", smallKey = "o_orderkey",
            expectedItems = 100000L, fpp = 0.01)
          .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
          .orderBy("l_orderkey")
      }),

    GraftQuery(
      // Z-order (Morton) clustering key (operators.Layout.zValue): the
      // write-side layout primitive that makes BOTH dimensions of a
      // 2-D workload file-skippable (Layout.zorderRepartition; locality
      // measured in LayoutSpec). The entry hash-gates the bit
      // arithmetic itself: the oracle spells out the same 20-term
      // interleave in SQL, so one misplaced bit in either engine breaks
      // every row's hash.
      "zo01_zorder_key",
      Some {
        val terms = (0 until 10).flatMap(i => Seq(
            s"(((o_custkey % 1024) >> $i) & 1) << ${2 * i}",
            s"(((o_orderkey % 1024) >> $i) & 1) << ${2 * i + 1}"))
          .map(term => s"($term)").mkString(" | ")
        s"SELECT o_orderkey, CAST($terms AS BIGINT) AS z FROM orders ORDER BY o_orderkey"
      },
      (s, d) => t(s, d).orders.select(col("o_orderkey"),
        graft.operators.Layout.zValue(
          pmod(col("o_custkey"), lit(1024)), pmod(col("o_orderkey"), lit(1024)),
          bits = 10).as("z"))
        .orderBy("o_orderkey")),

    GraftQuery(
      "qp01_pivot",
      Some("""SELECT user_id,
        |  COUNT(CASE WHEN event_type='click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type='error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type='signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type='view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => t(s, d).events
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")),

    GraftQuery(
      // wide→long reshaping (melt): the inverse of qp01_pivot
      "qp02_unpivot",
      Some("""SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part
        |) UNPIVOT (val FOR metric IN (p_size, p_retailprice))
        |ORDER BY p_partkey, metric""".stripMargin),
      (s, d) => t(s, d).part
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"), col("p_retailprice")),
          "metric", "val")
        .orderBy("p_partkey", "metric")),

    GraftQuery(
      "qs01_percentile",
      Some("SELECT l_returnflag, ROUND(quantile_cont(l_quantity, 0.5) * 100) / 100 + 0 AS med, " +
        "ROUND(quantile_cont(l_extendedprice, 0.9) * 100) / 100 + 0 AS p90 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          round2(expr("percentile(l_quantity, 0.5)")).as("med"),
          round2(expr("percentile(l_extendedprice, 0.9)")).as("p90"))
        .orderBy("l_returnflag")),

    GraftQuery(
      // The 100 TB percentile path: approx_percentile's bounded-memory
      // sketch (exact `percentile` holds every group value). Oracle
      // checks the exact quantile; the approximate side self-checks
      // within the declared 1 % relative band — the q12 HLL pattern.
      "qs02_percentile_approx",
      Some("SELECT l_returnflag, ROUND(quantile_cont(l_quantity, 0.5) * 100) / 100 + 0 AS med_exact, " +
        "CAST(1 AS BOOLEAN) AS within_1pct " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          round2(expr("percentile(l_quantity, 0.5)")).as("med_exact"),
          // accuracy 10000 => error <= 1/10000 of the rank range
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx"))
        .select(col("l_returnflag"), col("med_exact"),
          (abs(col("approx") - col("med_exact")) / col("med_exact") <= 0.01).as("within_1pct"))
        .orderBy("l_returnflag")),

    GraftQuery(
      // Fixed-width histogram/binning: one hash aggregate over the
      // bucket expression — the distribution-profiling primitive.
      // Integer-cents accumulation keeps the double SUM order-free.
      "qs03_histogram",
      Some("SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
      (s, d) => t(s, d).lineitem
        .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("price_cents"))
        .orderBy("bucket")),

    GraftQuery(
      // The whole curation pipeline as ONE verified query: exact dedup →
      // language ID → quality gate → token floor → per-language token
      // budget (graft.operators.TrainingPipeline). The oracle recomputes
      // every stage in DuckDB SQL.
      "tp01_training_pipeline",
      Some(CurateCte +
        """
        |SELECT pred_lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  ROUND(AVG(quality) * 10000) / 10000 + 0 AS avg_quality
        |FROM c WHERE pred_lang IN ('en','de','fr') AND quality >= 0.5 AND n_tokens >= 20
        |GROUP BY pred_lang ORDER BY pred_lang""".stripMargin),
      (s, d) => {
        import graft.operators.TrainingPipeline
        TrainingPipeline.languageBudget(
          TrainingPipeline.curate(t(s, d).documents,
            langs = Seq("en", "de", "fr"), minQuality = 0.5, minTokens = 20L))
      }),

    GraftQuery(
      // Cross-modal curation (tp08, multimodal/CrossModal — r17
      // directive #6): ONE pipeline over an interleaved documents +
      // media corpus — text through tp01's exact-dedup + language +
      // quality + token gates VERBATIM; images through a pixel-floor
      // quality gate then mm03's perceptual near-dup dedup (drop on a
      // lower-id near-dup — the first-occurrence convention); output a
      // unified survivor manifest. Gates run BEFORE the pairwise stage
      // (the fullDedup order-of-operations lesson, across modalities).
      // The image side interleaves BOTH media fixtures: the dHash set
      // (ids 0-5) and the flat mm01 images (ids 10-17) — img_0 (192 px)
      // fails the 256-px floor; the flat survivors (hash 0L) then form
      // one near-dup clique WITH the reversed-gradient images 3/4
      // (cross-fixture collisions are the realistic crawl case), so of
      // the hash-0 clique only id 3 survives; images 1/2 drop as
      // near-dups of 0; the stripes image 5 survives alone. Text
      // survivors are tp01's CTE (shared SQL text); image survivors the
      // closed-form VALUES (0, 3, 5).
      "tp08_crossmodal_curation",
      Some(CurateCte +
        """
        |SELECT modality, item_id FROM (
        |  SELECT 'text' AS modality, CAST(doc_id AS BIGINT) AS item_id FROM c
        |  WHERE pred_lang IN ('en','de','fr') AND quality >= 0.5 AND n_tokens >= 20
        |  UNION ALL
        |  SELECT 'image' AS modality, CAST(x AS BIGINT) AS item_id
        |  FROM (VALUES (0), (3), (5)) v(x)) u
        |ORDER BY modality, item_id""".stripMargin),
      (s, d) => graft.multimodal.CrossModal.curate(
          t(s, d).documents, crossModalImages(s),
          langs = Seq("en", "de", "fr"), minQuality = 0.5, minTokens = 20L,
          minPixels = 256, maxHamming = 3)),

    GraftQuery(
      // THREE-modality curation (tp09 — tp08 plus the audio branch):
      // audio clips go through a silence gate over the REAL decoded
      // RMS feature (silent clips fingerprint to 0L — the flat-image
      // sludge of the audio world, gated BEFORE the pairwise stage)
      // and then au01's near-dup dedup under the same first-occurrence
      // rule: the gain and DC copies (1, 2) and the one-window variant
      // (5) drop as near-dups of clip 0, the silent clip (4) is gated,
      // so audio survivors are the closed-form VALUES (0, 3). Each
      // modality keeps its own band geometry (image 4 bands / hamming
      // 3; audio 8 bands / hamming 5).
      "tp09_crossmodal_curation_full",
      Some(CrossModalFullOracle),
      (s, d) => graft.multimodal.CrossModal.curate(
          t(s, d).documents, crossModalImages(s), crossModalAudio(s),
          langs = Seq("en", "de", "fr"), minQuality = 0.5, minTokens = 20L,
          minPixels = 256, minRms = 0.01,
          imageMaxHamming = 3, audioMaxHamming = 5,
          imageNBands = 4, audioNBands = 8, maxBandBucket = 1000000)),

    GraftQuery(
      // STREAMING cross-modal curation (st18, StreamReplay
      // .crossModalCurateReplay — r18 directive #7): tp09 ON INGEST.
      // Three modality streams run inside ONE streaming query behind a
      // unified survivor stream — text through per-row gate
      // projections (TextAnalysis.rowGates, bit-identical to the batch
      // aggregates) then first-occurrence exact-dedup state; images
      // and audio through their gates and st15/st16's band-bucket
      // state machine at their own band geometries — all Append-mode,
      // one checkpoint, one sink. Pair events roll up at the
      // collection boundary into the first-occurrence drop rule (the
      // nightly roll-up, the videoDedupReplay discipline).
      // Chunking-invariant, so tp09's oracle gates st18 VERBATIM.
      "st18_stream_crossmodal_curation",
      Some(CrossModalFullOracle),
      (s, d) => graft.streaming.StreamReplay.crossModalCurateReplay(
          s, t(s, d).documents, crossModalImages(s), crossModalAudio(s),
          langs = Seq("en", "de", "fr"), minQuality = 0.5, minTokens = 20L,
          minPixels = 256, minRms = 0.01,
          imageMaxHamming = 3, audioMaxHamming = 5,
          imageNBands = 4, audioNBands = 8, nChunks = 3)
        .orderBy("modality", "item_id")),

    GraftQuery(
      // Deterministic hash sampling (the reproducible corpus-downsampling
      // primitive): md5-bucket under 20% — identical row selection in
      // both engines by construction.
      "tp02_deterministic_sample",
      Some("SELECT doc_id FROM documents " +
        "WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS BIGINT) % 100 < 20 " +
        "ORDER BY doc_id"),
      (s, d) => graft.operators.TrainingPipeline
        .deterministicSample(t(s, d).documents, "doc_id", 20)
        .select("doc_id").orderBy("doc_id")),

    GraftQuery(
      // Deterministic stratified sampling: at most 25 docs per language,
      // chosen by md5(doc_id) order — the per-stratum quota draw a
      // corpus rebalance runs. Identical selection in both engines by
      // construction (md5 hex sorts the same everywhere).
      "tp04_stratified_sample",
      Some("""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) q
        |WHERE rk <= 25 ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.TrainingPipeline
        .stratifiedSample(t(s, d).documents, "lang", "doc_id", quota = 25)
        .select("doc_id", "lang").orderBy("doc_id")),

    GraftQuery(
      // Domain-mixture sampling: the largest deterministic draw whose
      // language composition matches the target shares exactly (the
      // data-mixing step of a training pipeline). Quotas derive from
      // corpus counts inside the query — both engines compute the same
      // binding-stratum min and the same md5-order per-stratum prefix.
      "tp06_mixture_sample",
      Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT * FROM (VALUES
        |  ('en', CAST(0.40 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)),
        |  ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
        |  ('zh', CAST(0.15 AS DOUBLE))) AS t(lang, share)),
        |b AS (SELECT MIN(n / share) AS ntot FROM c JOIN t USING(lang)),
        |q AS (SELECT t.lang, FLOOR(t.share * b.ntot) AS quota FROM t, b),
        |r AS (SELECT doc_id, lang, ROW_NUMBER() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN q USING(lang)
        |WHERE r.rk <= q.quota ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.TrainingPipeline
        .mixtureSample(t(s, d).documents, "lang", "doc_id",
          Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15))
        .select("doc_id", "lang").orderBy("doc_id")),

    GraftQuery(
      // Deterministic weighted sampling without replacement
      // (Efraimidis–Spirakis, md5-derived uniforms, micro-quantized
      // ln): longer documents (weight = n_chars) are proportionally
      // more likely, and both engines draw the identical sample.
      "tp07_weighted_sample",
      Some("""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    CAST(FLOOR(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1.0)
        |      / 281474976710656.0) / n_chars * 1000000 + 0.5) AS BIGINT) AS prio
        |  FROM documents
        |  ORDER BY prio DESC, doc_id LIMIT 100) q
        |ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.TrainingPipeline
        .weightedSample(t(s, d).documents, "doc_id", "n_chars", k = 100)
        .select("doc_id", "lang").orderBy("doc_id")),

    GraftQuery(
      // Ordered funnel over the event stream: users reaching
      // view → click → purchase with each stage strictly after the
      // user's earliest completion of the previous one. One user-keyed
      // min-agg + equi-join per stage; never a per-user sequence array.
      "fn01_funnel",
      Some(FunnelCte +
        """
        |SELECT (SELECT COUNT(*) FROM s1) AS n_view,
        |       (SELECT COUNT(*) FROM s2) AS n_click,
        |       (SELECT COUNT(*) FROM s3) AS n_purchase""".stripMargin),
      (s, d) => graft.operators.Funnel.funnelCounts(
        t(s, d).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    GraftQuery(
      // Time-series gap fill + forward fill (operators/TimeSeries): the
      // dense-panel primitive behind rollup dashboards and feature
      // backfills. Spine = |key domain| x days (grows with keys and the
      // calendar, never with event volume); fill is one key-partitioned
      // ignore-nulls last() window. Integer cents keep the daily sums
      // order-free.
      "ts01_gap_fill",
      Some("""WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |r AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |keys AS (SELECT DISTINCT user_id, event_type FROM ev),
        |spine AS (SELECT k.user_id, k.event_type,
        |    CAST(unnest(generate_series(r.d0, r.d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM keys k, r),
        |daily AS (SELECT user_id, event_type, day, SUM(cents) AS day_cents
        |  FROM ev GROUP BY 1, 2, 3)
        |SELECT s.user_id, s.event_type, s.day, CAST(d2.day_cents AS BIGINT) AS day_value,
        |  CAST(last_value(d2.day_cents IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id, s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS filled_value
        |FROM spine s LEFT JOIN daily d2 USING (user_id, event_type, day)
        |ORDER BY user_id, event_type, day""".stripMargin),
      (s, d) => graft.operators.TimeSeries.gapFillForwardFill(
          t(s, d).events.select(col("user_id"), col("event_type"),
            to_date(col("ts")).as("day"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents")),
          keyCols = Seq("user_id", "event_type"), dayCol = "day", valueCol = "cents")
        .orderBy("user_id", "event_type", "day")),

    GraftQuery(
      // OHLC downsampling (operators/TimeSeries.downsampleOhlc): per
      // user per hour, open/high/low/close/count in ONE hash
      // aggregation — open/close via min_by/max_by over the composite
      // (ts, event_id) order (map-side combinable; no per-key window
      // sort), so the operator is a single shuffle and the output is
      // |keys x buckets| whatever the event volume. Values are
      // selections (never sums), so doubles compare exactly. The oracle
      // computes the same bars with first/last window functions.
      "ts02_downsample_ohlc",
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value
        |  FROM events),
        |w AS (SELECT user_id, bucket, value,
        |    FIRST_VALUE(value) OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id) AS open_v,
        |    LAST_VALUE(value) OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
        |  FROM b)
        |SELECT user_id, bucket, open_v, MAX(value) AS high_v, MIN(value) AS low_v,
        |  close_v, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM w GROUP BY user_id, bucket, open_v, close_v
        |ORDER BY user_id, bucket""".stripMargin),
      (s, d) => graft.operators.TimeSeries.downsampleOhlc(
          t(s, d).events.select("user_id", "ts", "event_id", "value"),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id", valueCol = "value")
        .orderBy("user_id", "bucket")),

    GraftQuery(
      // Cohort retention matrix (operators/TimeSeries): users bucketed
      // by first-activity day, traced across days-since. Two user-keyed
      // aggregates + one equi-join; output bounded by days², not users.
      "ct01_cohort_retention",
      Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1),
        |m AS (SELECT cohort_day, date_diff('day', cohort_day, day) AS days_since,
        |    COUNT(*) AS n_users FROM act JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, CAST(days_since AS INTEGER) AS days_since,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(first_value(n_users) OVER (PARTITION BY cohort_day ORDER BY days_since
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS cohort_size,
        |  ROUND(n_users / CAST(first_value(n_users) OVER (PARTITION BY cohort_day ORDER BY days_since
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) * 10000) / 10000 + 0 AS retention_pct
        |FROM m ORDER BY cohort_day, days_since""".stripMargin),
      (s, d) => graft.operators.TimeSeries
        .cohortRetention(t(s, d).events, "user_id", "ts")
        .orderBy("cohort_day", "days_since")),

    GraftQuery(
      // TF-IDF term ranking (operators/TextAnalysis.tfidfTopTerms): the
      // relevance-scoring primitive for corpus search/labeling. Integer
      // micro-nat scores (ta07 discipline) — no raw doubles cross the
      // engine boundary; ties rank by term.
      "ta10_tfidf",
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
        |    tf.tf * CAST(FLOOR(ln((nd.n + 1.0) / (dfq.df + 1.0)) * 1000000 + 0.5) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfq USING (w) CROSS JOIN nd)
        |SELECT doc_id, w AS term, tf, df, score_micro FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, w) AS rk FROM sc) q
        |WHERE rk <= 3 ORDER BY doc_id, term""".stripMargin),
      (s, d) => TextAnalysis.tfidfTopTerms(t(s, d).documents, k = 3)
        .orderBy("doc_id", "term")),

    GraftQuery(
      // BM25 keyword search (TextAnalysis.bm25): Okapi scoring for a
      // fixed 3-term query over the corpus — the retrieval primitive on
      // top of the ta10 tf/df machinery. idf crosses engines as
      // micro-nats; everything after is exactly-rounded IEEE arithmetic
      // in ONE spelled-out evaluation order, and per-term scores add in
      // query order via conditional aggregates (never an
      // order-dependent SUM). Terms span the df spectrum (rare 'dup'
      // df≈5%, common 'batch' df≈80%) so idf weighting is exercised.
      // The (k1 + 1) factor is CAST to DOUBLE in the oracle: DuckDB
      // would otherwise keep `tf * (1.2 + 1.0)` in exact DECIMAL (e.g.
      // 3 x 2.2 = 6.6 exactly) where Spark's double multiply yields
      // 6.6000000000000005 — a 1-ulp pre-round divergence. DuckDB's
      // DECIMAL division already lands in DOUBLE, so the idf ratio and
      // dl/avgdl paths are value-identical without casts (probed).
      "ir01_bm25",
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        |tf AS (SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        |  WHERE w IN ('query', 'dup', 'batch') GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.term,
        |    (CAST(FLOOR(ln((corpus.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * 1000000 + 0.5) AS BIGINT)
        |      / 1000000.0) * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
        |      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (CAST(corpus.sumdl AS DOUBLE) / corpus.n))) AS s
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
        |  ROUND((COALESCE(SUM(CASE WHEN term = 'query' THEN s END), 0)
        |       + COALESCE(SUM(CASE WHEN term = 'dup' THEN s END), 0)
        |       + COALESCE(SUM(CASE WHEN term = 'batch' THEN s END), 0)) * 10000) / 10000 + 0 AS score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.bm25(t(s, d).documents, Seq("query", "dup", "batch"))
        .orderBy("doc_id")),

    GraftQuery(
      // Signed feature hashing (TextAnalysis.featureHash): the
      // vocabulary-free text→sparse-vector featurizer — md5 buckets +
      // ±1 collision-cancelling signs, one explode + one hash
      // aggregate, output bounded by docs × buckets, never |vocab|.
      "fh01_feature_hash",
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents),
        |f AS (SELECT doc_id,
        |    ('0x' || substring(md5(w), 1, 8))::BIGINT % 1024 AS bucket,
        |    CASE WHEN ('0x' || substring(md5(w), 9, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sign
        |  FROM toks)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, CAST(SUM(sign) AS BIGINT) AS weight
        |FROM f GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin),
      (s, d) => TextAnalysis.featureHash(t(s, d).documents)
        .orderBy("doc_id", "bucket")),

    GraftQuery(
      // Canonical text normalization (the pass before any dedup /
      // fingerprint stage): codegen'd regexp_replace chain, RE2/Java
      // shared-syntax subset only.
      "ta09_normalize",
      Some("""WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text,
        |  CAST(len(list_filter(string_split(norm_text, ' '), x -> x <> '')) AS INTEGER) AS n_norm_tokens
        |FROM n ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.normalize(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      // Incremental aggregate maintenance (operators/IncrementalAgg):
      // the base per-user (count, cents) aggregate is maintained under
      // a CDC DELETE delta (every event_id % 10 == 0 retracted) by
      // merging the signed delta aggregate — never rescanning the
      // base. The oracle is the full recompute over the post-delete
      // data: maintained == recomputed, including fully-retracted keys
      // disappearing.
      "up03_incremental_agg",
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE event_id % 10 <> 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => {
        val ev = t(s, d).events.select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val baseAgg = ev.groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n"), sum("cents").cast("long").as("value_cents"))
        val deletes = ev.filter(col("event_id") % 10 === 0).withColumn("__sign", lit(-1L))
        graft.operators.IncrementalAgg.applyDelta(
            baseAgg,
            graft.operators.IncrementalAgg.signedAgg(deletes, Seq("user_id"), "cents", "__sign"),
            Seq("user_id"), "n", "value_cents")
          .orderBy("user_id")
      }),

    GraftQuery(
      // Snapshot diff (Upsert.snapshotDiff): the change-data-feed
      // derived between two keyed table versions when no change log was
      // captured — added/removed/changed per key, unchanged keys
      // dropped (at 100 TB they are the bulk; emitting them turns a
      // diff into a copy). One full outer equi-join, both sides shuffle
      // once on the key. Old = orderkey % 11 != 0; new = orderkey % 13
      // != 0 with even-key prices bumped one cent — so all three
      // classes are populated from deterministic arithmetic.
      "up04_snapshot_diff",
      Some("""WITH o AS (SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 11 <> 0),
        |n AS (SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
        |    + CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS cents
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed' ELSE 'changed' END AS change,
        |  o.cents AS old_cents, n.cents AS new_cents
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.cents <> n.cents
        |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val base = t(s, d).orders.select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        graft.operators.Upsert.snapshotDiff(
            base.filter(col("o_orderkey") % 11 =!= 0),
            base.filter(col("o_orderkey") % 13 =!= 0)
              .withColumn("cents", col("cents") +
                when(col("o_orderkey") % 2 === 0, 1).otherwise(0)),
            keys = Seq("o_orderkey"), compareCols = Seq("cents"))
          .select("o_orderkey", "change", "old_cents", "new_cents")
          .orderBy("o_orderkey")
      }),

    GraftQuery(
      // MERGE INTO (Upsert.mergeInto): the canonical lakehouse write —
      // one change batch with U(psert)/D(elete) ops applied to a keyed
      // snapshot in ONE full outer join. The change batch exercises all
      // paths from deterministic arithmetic: matched updates (%5,
      // cents+7), deletes (%10), and inserts (-(key+1) for %7 —
      // strictly negative, provably outside the >= 0 orderkey domain
      // at EVERY scale factor, unlike an additive offset which
      // collides once keys exceed it; plain -key collides at key 0).
      // The op/duplicate guards ride the join as codegen'd raise_error
      // CASEs (no extra pass).
      "up05_merge_into",
      Some("""WITH b AS (SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (
        |  SELECT o_orderkey, cents + 7 AS cents,
        |      CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |    FROM b WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1 AS o_orderkey, cents, 'U' FROM b WHERE o_orderkey % 7 = 0)
        |SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
        |  CASE WHEN c.op = 'U' THEN c.cents ELSE b.cents END AS cents
        |FROM b FULL OUTER JOIN c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val base = t(s, d).orders.select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val changes = base.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), (col("cents") + 7).as("cents"),
            when(col("o_orderkey") % 10 === 0, "D").otherwise("U").as("op"))
          .unionAll(base.filter(col("o_orderkey") % 7 === 0)
            .select((-col("o_orderkey") - 1).as("o_orderkey"),
              col("cents"), lit("U").as("op")))
        graft.operators.Upsert.mergeInto(base, changes,
            keys = Seq("o_orderkey"), valueCols = Seq("cents"), opCol = "op")
          .orderBy("o_orderkey")
      }),

    GraftQuery(
      // Gopher-style repetition filters (word-n-gram form): most
      // frequent bigram's share of bigram occurrences + fraction of
      // trigram occurrences in duplicated trigrams, with the keep/drop
      // bit at thresholds 0.20/0.30.
      "ta08_repetition",
      Some("""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, 2 AS n, unnest([t[i]||' '||t[i+1] for i in range(1, greatest(len(t),1))]) AS gram FROM toks
        |  UNION ALL
        |  SELECT doc_id, 3 AS n, unnest([t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1, greatest(len(t)-1,1))]) AS gram FROM toks),
        |c AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
        |r AS (SELECT doc_id,
        |    MAX(CASE WHEN n = 2 THEN c END) AS mx2,
        |    SUM(CASE WHEN n = 2 THEN c END) AS tot2,
        |    SUM(CASE WHEN n = 3 AND c > 1 THEN c END) AS dup3,
        |    SUM(CASE WHEN n = 3 THEN c END) AS tot3
        |  FROM c GROUP BY 1)
        |SELECT doc_id,
        |  ROUND(mx2 / tot2 * 10000) / 10000 + 0 AS top_bigram_frac,
        |  ROUND(COALESCE(dup3, 0) / tot3 * 10000) / 10000 + 0 AS dup_trigram_frac,
        |  (mx2 / tot2 <= 0.20 AND COALESCE(dup3, 0) / tot3 <= 0.30) AS pass_repetition
        |FROM r ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.repetitionScore(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      // Upsert materialization / CDC compaction: collapse the
      // append-only event stream to the latest record per
      // (user_id, event_type) — per-key partitioned window, one hash
      // shuffle, no global sort. Tie-free ordering via event_id.
      "up01_latest_by_key",
      Some("""SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) q
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
      (s, d) => graft.operators.Upsert
        .latestByKey(t(s, d).events, Seq("user_id", "event_type"),
          Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")),

    GraftQuery(
      // SCD2 history build — the other half of up01: instead of
      // compacting to the latest row, keep the full auditable timeline.
      // Per customer, orders sorted by (date, orderkey) form a change
      // log of o_orderpriority; consecutive no-change rows are
      // suppressed null-safely (IS DISTINCT FROM ≡ Spark's !(a <=> b)),
      // the survivors interval-ize via LEAD. Both engines order by the
      // DATE CAST (not the raw timestamp) so tie-breaking is in
      // lockstep. One hash shuffle + one sort for both windows —
      // plan-gated in UpsertSpec.
      "up02_scd2",
      Some("""WITH h AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d, o_orderpriority,
        |    LAG(o_orderpriority) OVER (
        |      PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev,
        |    LAG(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
        |  FROM orders),
        |c AS (SELECT * FROM h WHERE prev_d IS NULL OR prev IS DISTINCT FROM o_orderpriority)
        |SELECT o_custkey AS custkey, o_orderkey AS change_id, o_orderpriority AS priority,
        |  d AS valid_from,
        |  LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS valid_to,
        |  LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) IS NULL AS is_current
        |FROM c ORDER BY custkey, valid_from, change_id""".stripMargin),
      (s, d) => {
        val log = t(s, d).orders.select(
          col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("valid_from"),
          col("o_orderpriority").as("priority"))
        graft.operators.Upsert
          .scd2(log, Seq("o_custkey"), "valid_from", "priority",
            Seq(col("o_orderkey")))
          .select(col("o_custkey").as("custkey"), col("o_orderkey").as("change_id"),
            col("priority"), col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy("custkey", "valid_from", "change_id")
      }),

    GraftQuery(
      // Token-budget shard packing (sequence packing's shard-assignment
      // step): the Spark side runs the two-phase distributed prefix sum
      // (GlobalRank.withGlobalCumSum — no single-partition window); the
      // oracle expresses the same semantics with a window cumulative
      // sum, proving the distributed path bit-identical to the
      // SQL-standard formulation.
      "tp03_token_packing",
      Some("""WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 AS BIGINT) AS shard_id
        |FROM t ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.TrainingPipeline
        .packShards(t(s, d).documents, budgetTokens = 512L)
        .orderBy("doc_id")),

    GraftQuery(
      // Train/eval contamination (n-gram containment decontamination
      // pass): every train document's count of distinct 4-grams shared
      // with the held-out set (doc_id % 50 == 0 stands in for the eval
      // split). At 4-gram granularity the planted near-duplicates that
      // straddle the split boundary surface as contaminated (19 of 490
      // at sf0.01) while random vocabulary overlap does not.
      "tp05_contamination",
      Some("""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]
        |    for i in range(1, greatest(len(t)-2,1))]) AS s FROM toks) q),
        |hold AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        |c AS (SELECT sh.doc_id, count(*) AS n_shared FROM sh JOIN hold USING (s)
        |  WHERE sh.doc_id % 50 <> 0 GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(c.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(c.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
        |WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""".stripMargin),
      (s, d) => {
        val docs = t(s, d).documents
        graft.operators.TrainingPipeline.contaminationCheck(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0), n = 4)
          .orderBy("doc_id")
      }),

    GraftQuery(
      // Scale-safe global ranking (graft.operators.GlobalRank): the
      // two-phase distributed row-number path, verified bit-identical to
      // the window-function semantics by the DuckDB window oracle. The
      // Window.orderBy forms (q15_ntile/q15_distribution_windows) stay
      // as the compatibility surface; this is the variant whose plan has
      // no single-partition exchange.
      "qr01_global_ranks",
      Some("SELECT c_custkey, CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn, " +
        "ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) * 10000) / 10000 + 0 AS pr, " +
        "ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) * 10000) / 10000 + 0 AS cd, " +
        "CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS tile " +
        "FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val ranked = graft.operators.GlobalRank.distributions(
          t(s, d).customer, Seq(col("c_acctbal"), col("c_custkey")), ntileK = 4)
        ranked.select(col("c_custkey"), col("rn"),
            round4(col("pr")).as("pr"), round4(col("cd")).as("cd"), col("tile"))
          .orderBy("c_custkey")
      }),

    // ---------------------------------------------------------------- dedup suite
    GraftQuery(
      "dd01_exact_text",
      Some("SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents " +
        "GROUP BY text ORDER BY keep_id"),
      (s, d) => TextDedup.exactDedup(t(s, d).documents).orderBy("keep_id")),

    GraftQuery(
      "dd02_minhash_lsh",
      Some(BandCte +
        """,
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM band a JOIN band b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        |  FROM cand c JOIN sh ta ON ta.doc_id = c.doc_a JOIN sh tb ON tb.doc_id = c.doc_b AND tb.s = ta.s
        |  GROUP BY c.doc_a, c.doc_b)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i) * 10000) / 10000 + 0 AS jaccard
        |FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => TextDedup.minhashDedupPairs(t(s, d).documents, threshold = 0.8)),

    GraftQuery(
      "dd03_ngram_jaccard",
      Some(ShingleCte +
        """,
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh ta JOIN sh tb ON tb.s = ta.s AND ta.doc_id < tb.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i) * 10000) / 10000 + 0 AS jaccard
        |FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => TextDedup.exactJaccardPairs(t(s, d).documents, threshold = 0.8)),

    GraftQuery(
      // Capped-document-frequency Jaccard (dropStopShingles end-to-end):
      // shingles present in more than 1% of documents are dropped BEFORE
      // the pair self-join — the skew cap that bounds the join's hottest
      // key at production scale. The oracle repeats the identical cap
      // arithmetic (FLOOR truncation + GREATEST(1, ..) floor, df <= cap)
      // and the output carries the capped set sizes na/nb, which differ
      // from the raw sizes on 13/25 pairs at the gate sf — so the hash
      // verifies the cap itself, not just survivor membership.
      "dd09_capped_jaccard",
      Some(ShingleCte + """,
        |caps AS (SELECT s FROM (SELECT s, COUNT(*) AS df FROM sh GROUP BY s) f
        |  WHERE df <= GREATEST(1, CAST(FLOOR((SELECT COUNT(DISTINCT doc_id) FROM sh) * 0.01) AS BIGINT))),
        |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN caps USING (s)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
        |inter AS (
        |  SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS i
        |  FROM shc ta JOIN shc tb ON tb.s = ta.s AND ta.doc_id < tb.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, na.n AS na, nb.n AS nb,
        |  ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i) * 10000) / 10000 + 0 AS jaccard
        |FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => TextDedup.cappedJaccardPairs(t(s, d).documents,
        maxDocFraction = 0.01, threshold = 0.5)),

    GraftQuery(
      // Connected components over the near-dup pair graph — the survivor
      // -selection step of fullDedup, driver-visible: the Spark side is
      // the iterative min-label propagation (per-round checkpoint, no
      // graph library); the oracle computes the same component minima by
      // transitive closure with a RECURSIVE CTE. Output: every vertex
      // that appears in a pair, labelled with its component's min id.
      "dd08_components",
      Some(ShingleCte.replaceFirst("WITH toks", "WITH RECURSIVE toks") +
        """,
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh ta JOIN sh tb ON tb.s = ta.s AND ta.doc_id < tb.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT doc_id, CAST(LEAST(doc_id, MIN(d)) AS BIGINT) AS component
        |FROM (SELECT s AS doc_id, d FROM reach) q
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextDedup.connectedComponents(
          TextDedup.exactJaccardPairs(t(s, d).documents, threshold = 0.8))
        .orderBy("doc_id")),

    GraftQuery(
      // Quality-aware survivorship (dd10): each near-dup component
      // keeps its HIGHEST-quality member (ta02's quality score; ties →
      // min doc_id) instead of the min-id default — the curation
      // policy that preserves the best copy of truncated/noisy
      // near-dups. Same component closure as dd08; survivor labelling
      // is one first_value window in the component shuffle.
      "dd10_survivor_quality",
      Some(ShingleCte.replaceFirst("WITH toks", "WITH RECURSIVE toks") +
        """,
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh ta JOIN sh tb ON tb.s = ta.s AND ta.doc_id < tb.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
        |  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8),
        |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |comp AS (
        |  SELECT doc_id, CAST(LEAST(doc_id, MIN(d)) AS BIGINT) AS component
        |  FROM (SELECT s AS doc_id, d FROM reach) q GROUP BY doc_id),
        |qual AS (
        |  SELECT doc_id, ROUND(LEAST(1.0, COUNT(*) / 100.0)
        |    * (1.0 - SUM(CASE WHEN w IN ('the','a') THEN 1 ELSE 0 END) / COUNT(*))
        |    * 10000) / 10000 + 0 AS quality
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) x GROUP BY doc_id)
        |SELECT c.doc_id, c.component,
        |  FIRST_VALUE(c.doc_id) OVER (
        |    PARTITION BY c.component ORDER BY q.quality DESC, c.doc_id) AS survivor_id
        |FROM comp c JOIN qual q ON q.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin),
      (s, d) => {
        val docs = t(s, d).documents
        val comp = TextDedup.connectedComponents(
          TextDedup.exactJaccardPairs(docs, threshold = 0.8))
        TextDedup.survivorsByQuality(comp,
            TextAnalysis.qualityScore(docs).select("doc_id", "quality"))
          .orderBy("doc_id")
      }),

    GraftQuery(
      "dd04_simhash",
      Some(ShingleCte +
        """,
        |bits AS (SELECT doc_id, s, unnest(range(32)) AS k FROM sh),
        |bitval AS (
        |  SELECT doc_id, k,
        |    SUM(CASE WHEN CAST(FLOOR((position(substr(md5(s), 1 + k // 4, 1) IN '0123456789abcdef') - 1)
        |      / POW(2, k % 4)) AS INTEGER) % 2 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM bits GROUP BY doc_id, k)
        |SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN CAST(POW(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS fp
        |FROM bitval GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextDedup.simhashFingerprints(
        TextDedup.shingleSet(t(s, d).documents)).orderBy("doc_id")),

    GraftQuery(
      // Blocked SimHash near-dup PAIRS vs the oracle's quadratic ground
      // truth: with 4 byte-bands over 32 bits and maxDist <= 3, two
      // fingerprints within the distance MUST agree on at least one
      // band (pigeonhole), so the blocked equi-join finds exactly the
      // all-pairs answer — that equivalence is what this entry verifies.
      "dd06_simhash_pairs",
      Some(ShingleCte +
        """,
        |bits AS (SELECT doc_id, s, unnest(range(32)) AS k FROM sh),
        |bitval AS (
        |  SELECT doc_id, k,
        |    SUM(CASE WHEN CAST(FLOOR((position(substr(md5(s), 1 + k // 4, 1) IN '0123456789abcdef') - 1)
        |      / POW(2, k % 4)) AS INTEGER) % 2 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM bits GROUP BY doc_id, k),
        |fps AS (
        |  SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN CAST(POW(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS fp
        |  FROM bitval GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => {
        // The fingerprint pipeline (shingles + 32-wide vote aggregate)
        // feeds BOTH sides of the band self-join, so it is the working
        // set; TextDedup.withWorkingSet persists it, materializes the
        // (tiny) pair result, and releases the cache in eager mode —
        // and honors spark.graft.dedup.materialize=none by staying
        // fully lazy, exactly like the dd02/dd03 operator entries.
        TextDedup.withWorkingSet(
          TextDedup.simhashFingerprints(TextDedup.shingleSet(t(s, d).documents))) { fps =>
          TextDedup.simhashNearDupPairs(fps, maxDist = 3)
            .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
            .orderBy("doc_a", "doc_b")
        }
      }),

    GraftQuery(
      // Corpus-wide paragraph dedup (C4/RefinedWeb curation step). The
      // corpus has no natural paragraph breaks, so the entry first
      // chunks each document into deterministic 10-token "paragraphs"
      // (same derivation in the oracle) and then removes every
      // paragraph that occurs elsewhere in the corpus at an earlier
      // (doc_id, position), reassembling documents in order.
      "dd07_paragraph_dedup",
      Some("""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS t FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS para_idx, array_to_string(t[(i*10+1):(i*10+10)], ' ') AS para
        |  FROM toks, unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) q(i)),
        |ranked AS (SELECT doc_id, para_idx, para,
        |  ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM chunks)
        |SELECT doc_id, string_agg(para, e'\n\n' ORDER BY para_idx) AS text
        |FROM ranked WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // chunks go to the dedup as exploded rows, NOT via a joined
        // string (a token containing the separator would re-split
        // differently from the oracle's direct list formulation); no
        // whitespace filter either — chunks of non-empty tokens are
        // never empty, the oracle keeps every generated chunk, and a
        // Spark-side trim filter would silently diverge on
        // whitespace-only (non-space) tokens
        // Zero-token documents must emit NO chunks, like the oracle's
        // range(0, ceil(0/10.0)): without the guard, sequence(0,
        // floor((0-1)/10)) = sequence(0, -1) DESCENDS and fabricates two
        // empty paragraphs — a latent hash divergence the generated
        // corpus only masks because it has no empty docs (ADVICE r7).
        val toks = filter(split(lower(col("text")), " "), t => length(t) > 0)
        val paras = t(s, d).documents.filter(size(toks) > 0).select(col("doc_id"),
            posexplode(transform(sequence(lit(0), floor((size(toks) - 1) / 10).cast("int")),
              i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10)))))
              .as(Seq("para_idx", "para")))
        TextDedup.paragraphDedupFromParas(paras).orderBy("doc_id")
      }),

    GraftQuery(
      "dd05_embedding_neardup",
      Some("""WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    concat(CASE WHEN embedding[1]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[2]>=0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[3]>=0 THEN '1' ELSE '0' END, CASE WHEN embedding[4]>=0 THEN '1' ELSE '0' END) AS bucket
        |  FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
        |    list_dot_product(a.e, b2.e) /
        |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b2.e, b2.e))) AS c
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |SELECT vec_a, vec_b, ROUND(c * 10000) / 10000 + 0 AS score FROM s
        |WHERE c >= 0.35 ORDER BY vec_a, vec_b""".stripMargin),
      (s, d) => Similarity.nearDupPairs(t(s, d).embeddings, threshold = 0.35, bits = 4)),

    // ---------------------------------------------------------------- text analysis
    GraftQuery(
      "ta01_langid",
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN w = 'the' THEN 1 ELSE 0 END) / COUNT(*) AS r_the,
        |    SUM(CASE WHEN w = 'a' THEN 1 ELSE 0 END) / COUNT(*) AS r_a
        |  FROM tok WHERE w <> '' GROUP BY doc_id)
        |SELECT doc_id, CASE WHEN r_the >= 0.05 THEN 'en' WHEN r_a >= 0.05 THEN 'es'
        |  WHEN r_the >= 0.02 THEN 'de' WHEN r_a >= 0.02 THEN 'fr' ELSE 'zh' END AS pred_lang
        |FROM r ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.languageId(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      "ta02_quality",
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents),
        |r AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, AVG(LENGTH(w)) AS avg_len0,
        |    SUM(CASE WHEN w IN ('the','a') THEN 1 ELSE 0 END) / COUNT(*) AS stop0
        |  FROM tok WHERE w <> '' GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  ROUND(avg_len0 * 10000) / 10000 + 0 AS avg_token_len,
        |  ROUND(stop0 * 10000) / 10000 + 0 AS stop_ratio,
        |  ROUND(LEAST(1.0, n_tokens / 100.0) * (1.0 - stop0) * 10000) / 10000 + 0 AS quality
        |FROM r ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.qualityScore(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      "ta03_tokens",
      Some("""SELECT doc_id,
        |  CAST(len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_re_tokens,
        |  CAST(CEIL(LENGTH(text) / 4.0) AS INTEGER) AS n_bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.tokenCounts(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      "ta05_rolling_hash",
      Some("""SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |  (acc, c) -> (acc * 31 + c) % 1000000007) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.rollingHash(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      "ta04_fingerprint",
      Some("""WITH tok AS (
        |  SELECT DISTINCT doc_id, w FROM (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents) q
        |  WHERE w <> '')
        |SELECT doc_id, md5(string_agg(w, ' ' ORDER BY w)) AS fp FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.fingerprint(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      // PII redaction (TextAnalysis.redactPii): email then phone regex
      // passes over a contact line synthesized deterministically from
      // doc_id — identical input text in both engines, so the entry
      // verifies the REDACTION, not the synthesis. Patterns stay in the
      // syntax subset Java regex (Spark) and RE2 (DuckDB) agree on.
      "ta06_pii_redact",
      Some("""WITH raw AS (
        |  SELECT doc_id, substring(text, 1, 40) || ' contact: user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS raw
        |  FROM documents)
        |SELECT doc_id, regexp_replace(
        |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '[EMAIL]', 'g'),
        |    '[+]?[0-9][0-9-]{5,}[0-9]', '[PHONE]', 'g') AS redacted
        |FROM raw ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val raw = t(s, d).documents.select(col("doc_id"),
          concat(substring(col("text"), 1, 40),
            lit(" contact: user"), col("doc_id").cast("string"),
            lit("@mail.example or +1-555-"),
            lpad(col("doc_id").cast("string"), 4, "0")).as("raw"))
        TextAnalysis.redactPii(raw, "raw")
          .select("doc_id", "redacted").orderBy("doc_id")
      }),

    GraftQuery(
      // Statistical LM quality scoring (TextAnalysis.bigramNll): the
      // perplexity-filter signal, self-trained. Determinism contract in
      // the operator doc: per-pair ln P becomes integer micro-nats via
      // FLOOR(x*1e6 + 0.5) (IEEE-exact ops), the per-doc sum is exact
      // BIGINT (order-free), and only the final average is FP-rounded —
      // the q35/q36 integer-cents pattern applied to log space. The
      // oracle recomputes the whole model (counts, vocab, smoothing)
      // from the same corpus.
      "ta07_bigram_nll",
      Some("""WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents
        |), uni AS (
        |  SELECT w1, count(*) AS c1 FROM (SELECT unnest(toks) AS w1 FROM docs) GROUP BY w1
        |), vocab AS (SELECT count(*) AS v FROM uni),
        |pairs AS (
        |  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1, unnest(toks[2:len(toks)]) AS w2
        |  FROM docs WHERE len(toks) >= 2
        |), big AS (
        |  SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
        |), scored AS (
        |  SELECT p.doc_id,
        |    CAST(FLOOR(ln((b.c2 + 1.0) / (u.c1 + vocab.v)) * 1000000 + 0.5) AS BIGINT) AS micro
        |  FROM pairs p
        |  JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
        |  JOIN uni u ON p.w1 = u.w1
        |  CROSS JOIN vocab
        |)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_pairs,
        |  ROUND(-CAST(SUM(micro) AS DOUBLE) / 1000000 / count(*) * 10000) / 10000 + 0 AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.bigramNll(t(s, d).documents).orderBy("doc_id")),

    GraftQuery(
      // Multimodal decode, driver-visible (VERDICT r7 #2): deterministic
      // PNG/WAV fixtures (MediaFixture — closed-form pixel/sample
      // content) ingested through the real binaryFile source and decoded
      // by the REAL JDK decoders (javax.imageio, javax.sound.sampled).
      // Features are analytically known, so the oracle is a literal
      // VALUES table: the hash verifies the whole listing -> scan ->
      // mapPartitions-decode plumbing plus the decoders' arithmetic
      // (Rec.601 luma, normalized RMS, frame-count duration). The
      // sfDir is unused — media fixtures are scale-independent.
      "mm01_media_features",
      Some("""SELECT kind, CAST(idx AS INTEGER) AS idx,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(channels AS INTEGER) AS channels, CAST(luma AS DOUBLE) AS luma,
        |  CAST(duration_ms AS BIGINT) AS duration_ms,
        |  CAST(sample_rate AS INTEGER) AS sample_rate, CAST(rms AS DOUBLE) AS rms
        |FROM (VALUES
        |  ('audio', 0, NULL, NULL, 1, NULL, 250, 8000, 0.25),
        |  ('audio', 1, NULL, NULL, 1, NULL, 300, 8000, 0.28125),
        |  ('audio', 2, NULL, NULL, 1, NULL, 350, 8000, 0.3125),
        |  ('audio', 3, NULL, NULL, 1, NULL, 400, 8000, 0.34375),
        |  ('audio', 4, NULL, NULL, 1, NULL, 450, 8000, 0.375),
        |  ('audio', 5, NULL, NULL, 1, NULL, 500, 8000, 0.40625),
        |  ('audio', 6, NULL, NULL, 1, NULL, 550, 8000, 0.4375),
        |  ('audio', 7, NULL, NULL, 1, NULL, 600, 8000, 0.46875),
        |  ('image', 0, 16, 12, 3, 0.0392, NULL, NULL, NULL),
        |  ('image', 1, 19, 14, 3, 0.1529, NULL, NULL, NULL),
        |  ('image', 2, 22, 16, 3, 0.2667, NULL, NULL, NULL),
        |  ('image', 3, 25, 18, 3, 0.3804, NULL, NULL, NULL),
        |  ('image', 4, 28, 20, 3, 0.4941, NULL, NULL, NULL),
        |  ('image', 5, 31, 22, 3, 0.6078, NULL, NULL, NULL),
        |  ('image', 6, 34, 24, 3, 0.7216, NULL, NULL, NULL),
        |  ('image', 7, 37, 26, 3, 0.8353, NULL, NULL, NULL)
        |) t(kind, idx, width, height, channels, luma, duration_ms, sample_rate, rms)
        |ORDER BY kind, idx""".stripMargin),
      (s, d) => {
        import graft.multimodal.{MediaFixture, Multimodal}
        val dir = MediaFixture.ensure()
        val imgItems = Multimodal.readMedia(s, dir, "image/png", Some("*.png"))
        val audItems = Multimodal.readMedia(s, dir, "audio/wav", Some("*.wav"))
        def idxOf(items: org.apache.spark.sql.Dataset[Multimodal.MediaItem],
                  pat: String) =
          items.toDF.select(col("media_id"),
            regexp_extract(element_at(col("meta"), lit("path")), pat, 1)
              .cast("int").as("idx"))
        val img = Multimodal.decodeImages(imgItems, Multimodal.Decoders.imageio).toDF
          .join(idxOf(imgItems, "img_(\\d+)\\.png"), "media_id")
          .select(lit("image").as("kind"), col("idx"),
            col("width"), col("height"), col("channels"),
            round4(col("mean_luma")).as("luma"),
            lit(null).cast("bigint").as("duration_ms"),
            lit(null).cast("int").as("sample_rate"),
            lit(null).cast("double").as("rms"))
        val aud = Multimodal.decodeAudio(audItems, Multimodal.Decoders.wav).toDF
          .join(idxOf(audItems, "wav_(\\d+)\\.wav"), "media_id")
          .select(lit("audio").as("kind"), col("idx"),
            lit(null).cast("int").as("width"),
            lit(null).cast("int").as("height"),
            col("channels"), lit(null).cast("double").as("luma"),
            col("duration_ms"), col("sample_rate"), col("rms"))
        img.union(aud).orderBy("kind", "idx")
      }),
    GraftQuery(
      // mm02: REAL multi-frame container decode (animated GIF — the one
      // video-like format the JDK ships a codec for): every 2nd frame of
      // each generated vid_<i>.gif extracted through the GIF ImageReader
      // and feature-mapped. Constant-grey frames survive palette
      // quantization exactly, so per-frame luma is the same closed form
      // as mm01's stills; the VALUES oracle pins frame COUNTS (via which
      // frame_idx values appear), dimensions, and per-frame luma.
      "mm02_video_frames",
      Some("""SELECT CAST(idx AS INTEGER) AS idx, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(luma AS DOUBLE) AS luma
        |FROM (VALUES
        |  (0, 0, 8, 6, 0.0784),
        |  (0, 2, 8, 6, 0.1176),
        |  (1, 0, 9, 7, 0.1294),
        |  (1, 2, 9, 7, 0.1686),
        |  (2, 0, 10, 8, 0.1804),
        |  (2, 2, 10, 8, 0.2196),
        |  (2, 4, 10, 8, 0.2588),
        |  (3, 0, 11, 9, 0.2314),
        |  (3, 2, 11, 9, 0.2706),
        |  (3, 4, 11, 9, 0.3098),
        |  (4, 0, 12, 10, 0.2824),
        |  (4, 2, 12, 10, 0.3216),
        |  (4, 4, 12, 10, 0.3608),
        |  (4, 6, 12, 10, 0.4),
        |  (5, 0, 13, 11, 0.3333),
        |  (5, 2, 13, 11, 0.3725),
        |  (5, 4, 13, 11, 0.4118),
        |  (5, 6, 13, 11, 0.451),
        |  (6, 0, 14, 12, 0.3843),
        |  (6, 2, 14, 12, 0.4235),
        |  (6, 4, 14, 12, 0.4627),
        |  (6, 6, 14, 12, 0.502),
        |  (6, 8, 14, 12, 0.5412),
        |  (7, 0, 15, 13, 0.4353),
        |  (7, 2, 15, 13, 0.4745),
        |  (7, 4, 15, 13, 0.5137),
        |  (7, 6, 15, 13, 0.5529),
        |  (7, 8, 15, 13, 0.5922)
        |) t(idx, frame_idx, width, height, luma)
        |ORDER BY idx, frame_idx""".stripMargin),
      (s, d) => {
        import graft.multimodal.{MediaFixture, Multimodal}
        val dir = MediaFixture.ensure()
        val vids = Multimodal.readMedia(s, dir, "image/gif", Some("*.gif"))
        val idx = vids.toDF.select(col("media_id"),
          regexp_extract(element_at(col("meta"), lit("path")), "vid_(\\d+)\\.gif", 1)
            .cast("int").as("idx"))
        Multimodal.decodeFrames(vids, everyNth = 2).toDF
          .join(idx, "media_id")
          .select(col("idx"), col("frame_idx"), col("width"), col("height"),
            round4(col("mean_luma")).as("luma"))
          .orderBy("idx", "frame_idx")
      }),

    GraftQuery(
      // Perceptual image near-dup dedup (mm03, ImageHash): the image
      // analog of dd04 SimHash — 64-bit dHash per decoded image
      // (integer Rec.601 luma, exact cross-multiplied cell compares),
      // banded Hamming equi-join with GUARANTEED recall at
      // maxHamming < nBands (pigeonhole), band-bucket width cap riding
      // an aggregate+broadcast raise. Fixture images are constant-value
      // cells on the hash grid, so every expected hash — and thus every
      // pair's Hamming distance — is closed-form: the brightness-
      // shifted gradient pair lands at distance 0 (the invariance dHash
      // exists for), the one-cell dip at 1, the reversed/striped images
      // >= 31 bits away. The VALUES oracle verifies the whole
      // listing -> decode -> hash -> band-join -> verify pipeline.
      "mm03_image_dhash",
      Some(DhashPairsOracle),
      (s, d) =>
        graft.multimodal.ImageHash.nearDupPairs(dhashFixtureHashes(s), maxHamming = 3)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Video near-dup dedup (mm05, ImageHash.videoNearDupPairs): the
      // re-encode/re-upload detector for video corpora — per-frame
      // dHash through the REAL GIF frame reader (shared with mm02,
      // same composition-safety contract), then FRAME-ALIGNED banded
      // Hamming matching with an exact integer 2/3 match-fraction
      // gate. Fixture videos are sequences of the mm03 cell patterns,
      // so every frame hash is an already-pinned closed form: the
      // brightness-shifted and one-cell-dipped copies pair at 3/3
      // matched frames; the REORDERED cut of the same scenes (vid 3)
      // and the flat stripes-only video (vid 4, exactly 1 aligned
      // match each) must NOT pair.
      "mm05_video_dhash",
      Some(DhashVidPairsOracle),
      (s, d) =>
        graft.multimodal.ImageHash.videoNearDupPairs(dhashVidFixtureFrames(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("n_matched"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // OFFSET-TOLERANT video near-dup (mm06, ImageHash
      // .videoNearDupPairsOffset — r17 directive #3): mm05 demands
      // exact frame alignment, so a trimmed-intro copy never pairs;
      // this form sweeps shifts in [-1, 1] with the ALIGNED position
      // in the join key (bounded replication — the RangeJoin
      // discipline), and a pair qualifies on its BEST single shift at
      // the same exact integer 2/3 fraction of the longer video. The
      // fixture pins the semantic line: the trimmed-intro copy (vid 5)
      // pairs at shift +1; the ROTATION (vid 3) — which aligned mm05
      // rightly ignores — pairs at shift -1 because a rotated 3-frame
      // clip IS a 2-frame overlap; the genuinely SHUFFLED cut (vid 6)
      // shares no single alignment and never pairs (derivation in the
      // MediaFixture comment).
      "mm06_video_dhash_offset",
      Some("""SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
        |  CAST(n_matched AS BIGINT) AS n_matched, CAST(shift AS INTEGER) AS shift
        |FROM (VALUES (0, 1, 3, 0), (0, 2, 3, 0), (0, 3, 2, -1), (0, 5, 2, 1),
        |  (1, 2, 3, 0), (1, 3, 2, -1), (1, 5, 2, 1), (2, 3, 2, -1), (2, 5, 2, 1))
        |t(idx_a, idx_b, n_matched, shift) ORDER BY idx_a, idx_b""".stripMargin),
      (s, d) =>
        graft.multimodal.ImageHash.videoNearDupPairsOffset(
            dhashVidFixtureFrames(s), maxHamming = 3,
            minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Incremental offset-tolerant VIDEO matching against a PERSISTED
      // frame band index (mm07 — au04's machinery over video frames,
      // position sources interchangeable by construction): history
      // (vids 0/3/4/6, including the rotation pair (0,3) emitted at
      // build) is frame-hashed and bucket-written ONCE; the nightly
      // batch (1/2/5 — the re-encodes and the trimmed-intro copy) is
      // the only thing re-decoded. Pairs = (indexed × new) +
      // (new × new): every mm06 row involving the batch, and the
      // all-history rotation pair (0,3) must NOT re-emit — the oracle
      // is mm06's minus exactly that row.
      "mm07_video_offset_incremental",
      Some("""SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
        |  CAST(n_matched AS BIGINT) AS n_matched, CAST(shift AS INTEGER) AS shift
        |FROM (VALUES (0, 1, 3, 0), (0, 2, 3, 0), (0, 5, 2, 1), (1, 2, 3, 0),
        |  (1, 3, 2, -1), (1, 5, 2, 1), (2, 3, 2, -1), (2, 5, 2, 1))
        |t(idx_a, idx_b, n_matched, shift) ORDER BY idx_a, idx_b""".stripMargin),
      (s, d) => {
        val frames = dhashVidFixtureFrames(s)
        graft.multimodal.ImageHash.incrementalNearDupPairsOffset(
            frames.filter(col("id").isin(1, 2, 5)), dhashVidIndexLoaded(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")
      }),

    GraftQuery(
      // Streaming video dedup (st17, StreamReplay.videoDedupReplay —
      // r17 directive #5): mm05's pipeline ON INGEST — the shared
      // banding projection runs inside the streaming query and
      // (frame_idx, band, bv)-keyed state emits each verified
      // frame-level match when its second member arrives (alignment in
      // the state key, exactly as it is in the batch join key); the
      // per-video count + fraction gate is the nightly roll-up over
      // the distinct matched-frame events. Chunking-invariant, so
      // mm05's oracle gates st17 VERBATIM.
      "st17_stream_video_dedup",
      Some(DhashVidPairsOracle),
      (s, d) =>
        graft.streaming.StreamReplay.videoDedupReplay(
            s, dhashVidFixtureFrames(s), maxHamming = 3,
            minMatchNum = 2, minMatchDen = 3, nChunks = 3)
          .select(col("id_a").cast("int").as("idx_a"),
            col("id_b").cast("int").as("idx_b"), col("n_matched"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Streaming perceptual image dedup (st15): mm03's whole pipeline
      // — the SHARED dHash banding projection + popcount verify — run
      // ON INGEST inside one streaming query, with band-bucket keyed
      // state (StatefulOps.dhashDedupStream) emitting each VERIFIED
      // near pair the moment its second member arrives (verify fused
      // into emission — no second pass). Arrival-order-invariance is
      // the gate: distinct streamed pairs must equal the batch answer
      // on any chunking, so mm03's oracle gates st15 VERBATIM.
      "st15_stream_image_dedup",
      Some(DhashPairsOracle),
      (s, d) =>
        graft.streaming.StreamReplay.imageDedupReplay(
            s, dhashFixtureHashes(s), maxHamming = 3)
          .select(col("id_a").cast("int").as("idx_a"),
            col("id_b").cast("int").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Audio perceptual near-dup (au01, multimodal/AudioHash — r17
      // directive #2, the spectral tier audio corpora lacked): a
      // TIME x LAG grid of exact-integer difference energies with only
      // the adjacent-lag comparison SIGNS kept — the dHash discipline
      // in 1-D (Haitsma-Kalker's band-difference formulation in the
      // autocorrelation domain, where integers stay exact). Real WAV
      // decode through javax.sound; DC-shifted and gain-scaled copies
      // hash IDENTICALLY by construction; the banded Hamming join is
      // ImageHash.nearDupPairs VERBATIM (one banding geometry for
      // images, videos, and audio). The fixture clips are closed-form
      // square waves whose per-window lag-energy counts are analytic
      // (MediaFixture afp comment), so this is a literal VALUES
      // oracle: DC copy + gain copy pair at 0; the one-window-swapped
      // clip pairs with all three at exactly 5 bits; the period-16 and
      // silent clips pair with nothing.
      "au01_audio_fingerprint",
      Some(AfpPairsOracle),
      (s, d) =>
        graft.multimodal.AudioHash.nearDupPairs(afpFixtureHashes(s),
            maxHamming = 5, nBands = 8)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Incremental audio dedup against a PERSISTED fingerprint band
      // index (au02 — the mm04 lifecycle for audio): history (clips
      // 0/1/3) is decoded, fingerprinted, banded, and bucket-written
      // ONCE; the nightly batch (2/4/5) is the only thing re-decoded,
      // and the candidate join reads the index side exchange-free on
      // its bucket key. Pairs = (indexed x new) + (new x new) — the
      // all-history pair (0,1) must NOT re-emit. The index machinery
      // is ImageHash's verbatim (hash-source-agnostic), banding
      // geometry from the index sidecar.
      "au02_audio_fingerprint_incremental",
      Some("""SELECT CAST(idx_a AS INTEGER) AS idx_a, CAST(idx_b AS INTEGER) AS idx_b,
        |  CAST(hamming AS INTEGER) AS hamming
        |FROM (VALUES (0, 2, 0), (0, 5, 5), (1, 2, 0), (1, 5, 5), (2, 5, 5))
        |t(idx_a, idx_b, hamming) ORDER BY idx_a, idx_b""".stripMargin),
      (s, d) => {
        val hashes = afpFixtureHashes(s)
        graft.multimodal.AudioHash.incrementalNearDupPairs(
            hashes.filter(!col("id").isin(0, 1, 3)), afpIndexLoaded(s),
            maxHamming = 5)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")
      }),

    GraftQuery(
      // OFFSET-TOLERANT audio near-dup (au03, AudioHash
      // .nearDupPairsOffset — r18 directive #1): au01's clip-GLOBAL
      // fingerprint misses a copy with a trimmed intro (every window
      // boundary shifts — the failure mode mm05 had for video, closed
      // by mm06), so this tier cuts the PCM into fixed-length SEGMENTS
      // (afpSegments64 — the FrameHash discipline over audio, memory
      // O(segFrames)) and runs mm06's bounded alignment sweep over
      // segment positions VERBATIM (position-source-agnostic — one
      // sweep for video frames and audio segments). The fixture clips
      // are concatenations of the pinned afp square waves, so every
      // segment hash is a closed form: the gain-scaled copy pairs at
      // shift 0 (3/3), the intro-trimmed copy pairs at shift +1 (2
      // matches, which the ALIGNED form misses — asserted in
      // AudioHashSpec), the shuffled remix shares no single alignment
      // and never pairs, and the sub-segment tail on clip 3 is
      // dropped by the fixed-length cut without disturbing its
      // segment hashes (derivation in the MediaFixture comment).
      "au03_audio_fingerprint_offset",
      Some(AfpOffsetOracle),
      (s, d) =>
        graft.multimodal.AudioHash.nearDupPairsOffset(afpSegFixtureHashes(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Incremental OFFSET-TOLERANT dedup against a PERSISTED segment
      // band index (au04 — the au02 lifecycle for the trim-tolerant
      // tier): history (clips 0/3/4, including the (0,4) DC-copy pair
      // emitted at build) is decoded, segmented, banded, and
      // bucket-written ONCE; the nightly batch (1/2) is the only thing
      // re-fingerprinted. Only the NEW side is replicated — in both
      // sweep roles (as the A side at pos = idx − s, and as the B
      // probe at pos = idx + s for pairs where the INDEXED clip's
      // intro is skipped) — so the index is never replicated or
      // re-scanned beyond the candidate join, and the fraction gate's
      // clip lengths come from the index's own counts/ table. Pairs =
      // (indexed × new) + (new × new); the all-history pair (0,4)
      // must NOT re-emit — the oracle is au03's minus exactly that
      // row.
      "au04_audio_offset_incremental",
      Some(AfpOffsetIncOracle),
      (s, d) => {
        val segs = afpSegFixtureHashes(s)
        graft.multimodal.AudioHash.incrementalNearDupPairsOffset(
            segs.filter(col("id").isin(1, 2)), afpSegIndexLoaded(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")
      }),

    GraftQuery(
      // Segment-index APPEND lifecycle (au05 — dd13 for the
      // trim-tolerant tier, and the counts-merge witness): clip 0 —
      // party to every history×batch row of au04's oracle — enters the
      // index via appendToSegmentIndex, which must land BOTH its band
      // rows and its counts/ rows: the offset sweep's fraction gate
      // reads the longer side's length from the index's counts table,
      // so a dropped counts append silently kills the (0,1)/(0,2)
      // rows. au04's oracle gates it VERBATIM (append + maintenance
      // compaction answer-invariant).
      "au05_segment_index_append",
      Some(AfpOffsetIncOracle),
      (s, d) => {
        val segs = afpSegFixtureHashes(s)
        graft.multimodal.AudioHash.incrementalNearDupPairsOffset(
            segs.filter(col("id").isin(1, 2)), afpSegIndexAppended(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")
      }),

    GraftQuery(
      // STREAMING incremental offset-tolerant dedup against the
      // PERSISTED segment index (st20, StreamReplay
      // .incrementalOffsetDedupReplay): au04 ON INGEST — the
      // composition an ingest-time trim-tolerant dedup user runs. The
      // (indexed × new) candidates come from two STREAM-STATIC
      // equi-joins against the bands table (stateless — the index
      // never enters state), the (new × new) candidates from st19's
      // state machine, all behind one Append-mode query; the fraction
      // gate's history lengths come from the index's counts/ table.
      // Chunking-invariant; au04's oracle gates it VERBATIM — history
      // pairs provably never re-emit on the stream either.
      "st20_stream_audio_offset_incremental",
      Some(AfpOffsetIncOracle),
      (s, d) =>
        graft.streaming.StreamReplay.incrementalOffsetDedupReplay(
            s, afpSegFixtureHashes(s).filter(col("id").isin(1, 2))
              .withColumnRenamed("afp", "dhash"),
            afpSegIndexLoaded(s),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1,
            nChunks = 3)
          .select(col("id_a").cast("int").as("idx_a"),
            col("id_b").cast("int").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // STREAMING offset-tolerant dedup (st19, StreamReplay
      // .offsetDedupReplay): au03's bounded alignment sweep ON INGEST —
      // the trim tolerance st17's aligned state machine lacks. Each
      // arriving segment is registered in its band bucket at its TRUE
      // position (B role) and at each aligned position pos = idx − s
      // (A role) — mm06's constant-factor replication folded into the
      // STATE key, so state stays bounded by per-(shifted)-position
      // buckets. Verified matches emit in batch orientation (A-id <
      // B-id, shift = id_a's intro skip) the moment the second member
      // arrives; the best-single-shift + fraction gate is the roll-up
      // over distinct events. Chunking-invariant; au03's oracle gates
      // it VERBATIM. Position sources are interchangeable — the same
      // operator is the trim-tolerant video ingest form.
      "st19_stream_audio_offset",
      Some(AfpOffsetOracle),
      (s, d) =>
        graft.streaming.StreamReplay.offsetDedupReplay(
            s, afpSegFixtureHashes(s)
              .withColumnRenamed("afp", "dhash"),
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1,
            nChunks = 3)
          .select(col("id_a").cast("int").as("idx_a"),
            col("id_b").cast("int").as("idx_b"),
            col("n_matched"), col("shift"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Streaming audio dedup (st16): au01's fingerprints through the
      // SAME band-bucket keyed state machine as st15 (the banding
      // projection and pair-emission state are hash-source-agnostic —
      // one definition for images, videos, and audio ON INGEST). The
      // distinct streamed pairs equal the batch answer on any
      // chunking, so au01's oracle gates st16 VERBATIM.
      "st16_stream_audio_dedup",
      Some(AfpPairsOracle),
      (s, d) =>
        graft.streaming.StreamReplay.imageDedupReplay(
            s, afpFixtureHashes(s).withColumnRenamed("afp", "dhash"),
            maxHamming = 5, nBands = 8, nChunks = 3)
          .select(col("id_a").cast("int").as("idx_a"),
            col("id_b").cast("int").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // Incremental image dedup against a PERSISTED dHash band index
      // (mm04 — the dd11 lifecycle for the image family): history
      // (images 0/3/4/5) is decoded, hashed, banded, and bucket-written
      // ONCE; the "nightly" batch (1/2) is the only thing re-hashed,
      // and the candidate join reads the index side exchange-free on
      // its bucket key. Pairs = (indexed x new) + (new x new) — the
      // all-history pair (3,4) must NOT re-emit. Banding geometry
      // comes from the index sidecar; recall stays exact
      // (maxHamming < nBands, pigeonhole).
      "mm04_image_dhash_incremental",
      Some(DhashIncOracle),
      (s, d) =>
        graft.multimodal.ImageHash.incrementalNearDupPairs(
            dhashFixtureHashes(s).filter(col("id").isin(1, 2)),
            dhashIndexLoaded(s), maxHamming = 3)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // dHash-index APPEND lifecycle (mm08 — dd13 for the image
      // family): image 0 — the hub of every mm04 pair — enters the
      // index via appendToDhashIndex instead of the initial build, so
      // every oracle row (0,1) (0,2) exists ONLY if the appended band
      // rows really joined; (1,2) is new×new. mm04's oracle gates it
      // VERBATIM (append + maintenance compaction answer-invariant).
      "mm08_image_index_append",
      Some(DhashIncOracle),
      (s, d) =>
        graft.multimodal.ImageHash.incrementalNearDupPairs(
            dhashFixtureHashes(s).filter(col("id").isin(1, 2)),
            dhashIndexAppended(s), maxHamming = 3)
          .select(col("id_a").as("idx_a"), col("id_b").as("idx_b"), col("hamming"))
          .orderBy("idx_a", "idx_b")),

    GraftQuery(
      // RAG document chunking (TextAnalysis.chunkDocuments): fixed-size
      // overlapping word windows (50 words, stride 40) — pure
      // projection + explode, ZERO shuffles; chunking a 100 TB corpus
      // is one embarrassingly-parallel scan. chunk_hash pins the exact
      // chunk text through md5 so the oracle verifies content, not just
      // counts.
      "ch01_chunking",
      Some("""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0),
        |x AS (SELECT doc_id, n, w,
        |    unnest(range(CAST(ceil(n / 40.0) AS BIGINT))) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id,
        |  CAST(least(50, n - chunk_id * 40) AS INTEGER) AS n_words,
        |  md5(array_to_string(list_slice(w, CAST(chunk_id * 40 + 1 AS BIGINT),
        |    CAST(least(chunk_id * 40 + 50, n) AS BIGINT)), ' ')) AS chunk_hash
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin),
      (s, d) => graft.operators.TextAnalysis.chunkDocuments(t(s, d).documents)
        .orderBy("doc_id", "chunk_id")),

    GraftQuery(
      // Column profiler (operators/Profile): per-column row/null/exact
      // distinct counts + min/max as one hash-agg branch per column
      // unioned together — columnar pruning reads each column's bytes
      // exactly once, and the branch form avoids the wide multi-distinct
      // Expand + SortAggregate fallback (measured 5x slower). Doubles
      // are profiled through a BIGINT cast upstream so the min/max
      // STRING rendering is engine-independent.
      "pr01_profile",
      Some("""SELECT 'l_orderkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(l_orderkey) AS VARCHAR) AS min_s, CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
        |  FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
        |    CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
        |  FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
        |    CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
        |  FROM lineitem
        |UNION ALL
        |SELECT 'qty_units', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(DISTINCT CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT),
        |    CAST(MIN(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS VARCHAR),
        |    CAST(MAX(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS VARCHAR)
        |  FROM lineitem
        |ORDER BY column_name""".stripMargin),
      (s, d) => graft.operators.Profile.profile(
          t(s, d).lineitem.withColumn("qty_units",
            floor(col("l_quantity") * 100 + 0.5).cast("long")),
          Seq("l_orderkey", "l_returnflag", "l_shipdate", "qty_units"))
        .orderBy("column_name")),

    GraftQuery(
      // Fixed-iteration PageRank (operators/PageRank) over the
      // symmetric customer↔supplier trade graph (supplier nodes offset
      // by 1e7 into a disjoint id space). INTEGER micro-unit arithmetic
      // (contributions via integer division) makes every iteration
      // bitwise deterministic under any partitioning — the oracle
      // unrolls the same three iterations in SQL with DuckDB's floor
      // division. Per iteration: one src-keyed equi-join + one
      // dst-keyed aggregation, rounds materialized (dd08 discipline).
      "pg01_pagerank",
      Some("""WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM e0 UNION ALL SELECT s, c FROM e0),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node, SUM((p.r * 85) // (100 * d.outdeg)) AS inflow
        |  FROM e JOIN r0 p ON e.src = p.node JOIN deg d ON d.src = e.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.inflow, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
        |c2 AS (SELECT e.dst AS node, SUM((p.r * 85) // (100 * d.outdeg)) AS inflow
        |  FROM e JOIN r1 p ON e.src = p.node JOIN deg d ON d.src = e.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.inflow, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
        |c3 AS (SELECT e.dst AS node, SUM((p.r * 85) // (100 * d.outdeg)) AS inflow
        |  FROM e JOIN r2 p ON e.src = p.node JOIN deg d ON d.src = e.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + COALESCE(c3.inflow, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
        |SELECT node, r AS rank_u FROM r3 ORDER BY node""".stripMargin),
      (s, d) => {
        val li = t(s, d).lineitem.select(col("l_orderkey"), col("l_suppkey"))
        val e0 = li.join(t(s, d).orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), (col("l_suppkey") + 10000000L).as("s"))
          .distinct()
        val edges = e0.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(e0.select(col("s").as("src"), col("c").as("dst")))
        graft.operators.PageRank.pagerankMicro(edges, iterations = 3)
          .select(col("node"), col("rank_u"))
          .orderBy("node")
      }),

    GraftQuery(
      // Weighted PERSONALIZED PageRank / random walk with restart
      // (pg02): the recommendation variant of pg01 — edges weighted by
      // customer×supplier interaction count (the multiplicity pg01
      // distinct'ed away), restart mass returning only to nation-1
      // customers. Same integer micro-unit discipline (bitwise
      // deterministic under any partitioning; the restart total is a
      // 1-row broadcast, never collected); the oracle unrolls both
      // iterations with the identical integer DIV arithmetic.
      "pg02_personalized_pagerank",
      Some("""WITH e0 AS (
        |  SELECT o_custkey AS c, l_suppkey + 10000000 AS s, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |e AS (SELECT c AS src, s AS dst, w FROM e0 UNION ALL SELECT s, c, w FROM e0),
        |rs AS (SELECT c_custkey AS node, CAST(1 AS BIGINT) AS p FROM customer WHERE c_nationkey = 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(p) AS BIGINT) AS pp FROM rs),
        |nodes AS (SELECT src AS node FROM e UNION SELECT node FROM rs),
        |deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM e GROUP BY 1),
        |base AS (SELECT rs.node, (tot.ns * 1000000 * 15 * rs.p) // (100 * tot.pp) AS b
        |  FROM rs CROSS JOIN tot),
        |r0 AS (SELECT n.node, CAST(COALESCE((tot.ns * 1000000 * rs.p) // tot.pp, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN rs ON rs.node = n.node CROSS JOIN tot),
        |c1 AS (SELECT e.dst AS node, SUM((p.r * 85 * e.w) // (100 * d.wdeg)) AS inflow
        |  FROM e JOIN r0 p ON e.src = p.node JOIN deg d ON d.src = e.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(COALESCE(b.b, 0) + COALESCE(c1.inflow, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN base b ON b.node = n.node LEFT JOIN c1 ON c1.node = n.node),
        |c2 AS (SELECT e.dst AS node, SUM((p.r * 85 * e.w) // (100 * d.wdeg)) AS inflow
        |  FROM e JOIN r1 p ON e.src = p.node JOIN deg d ON d.src = e.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(COALESCE(b.b, 0) + COALESCE(c2.inflow, 0) AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN base b ON b.node = n.node LEFT JOIN c2 ON c2.node = n.node)
        |SELECT node, r AS rank_u FROM r2 ORDER BY node""".stripMargin),
      (s, d) => {
        val li = t(s, d).lineitem.select(col("l_orderkey"), col("l_suppkey"))
        val e0 = li.join(t(s, d).orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + 10000000L).as("s"))
          .agg(count(lit(1)).as("w"))
        val edges = e0.select(col("c").as("src"), col("s").as("dst"), col("w"))
          .unionAll(e0.select(col("s").as("src"), col("c").as("dst"), col("w")))
        val restart = t(s, d).customer.filter(col("c_nationkey") === 1)
          .select(col("c_custkey").as("node"), lit(1L).as("p"))
        graft.operators.PageRank.personalizedPagerankMicro(edges, restart, iterations = 2)
          .select(col("node"), col("rank_u"))
          .orderBy("node")
      }),

    GraftQuery(
      // Sorted-neighborhood fuzzy join (operators/FuzzyJoin): the
      // entity-resolution blocking that turns all-pairs edit distance
      // into O(N·window) — global rank via the two-phase GlobalRank,
      // neighbor join via the RangeJoin bucket trick (2 buckets/row,
      // plain equi-join), levenshtein verify as a post-filter. No
      // all-pairs stage at any scale.
      "fz01_fuzzy_join",
      Some("""WITH r AS (SELECT p_partkey, p_name,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS rn FROM part)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS s_a, b.p_name AS s_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin),
      (s, d) => graft.operators.FuzzyJoin.sortedNeighborhood(
          t(s, d).part, "p_partkey", "p_name", window = 3, maxDistance = 2)
        .select(col("id_a").as("id_a"), col("id_b"), col("s_a"), col("s_b"), col("dist"))
        .orderBy("id_a", "id_b")),

    GraftQuery(
      // EXACT q-gram fuzzy join (FuzzyJoin.qgramJoin): count-filtered
      // prefix blocking (SSJoin family) — COMPLETE recall, no all-pairs
      // stage; multiset (gram, occurrence) tokens ordered
      // rarest-df-first, prefix = q*d+1 tokens, levenshtein verify
      // post-join. Exactness is spec-gated against brute force
      // (FuzzyJoinSpec); this entry pins cross-engine determinism on a
      // %20 key slice — the synthetic part vocabulary is so small that
      // the TRUE full-table answer grows quasi-quadratically (5.5M
      // pairs at sf0.1), which would measure output volume, not the
      // operator.
      "fz02_qgram_join",
      Some("""WITH p AS (SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey % 20 = 0),
        |g AS (SELECT id, s, substr(s, CAST(i AS INTEGER), 2) AS gram
        |      FROM p, unnest(range(1, length(s))) AS t(i)),
        |gc AS (SELECT id, s, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |tok AS (SELECT id, s, gram, CAST(unnest(range(1, cnt + 1)) AS INTEGER) AS occ FROM gc),
        |dfreq AS (SELECT gram, COUNT(DISTINCT id) AS df FROM tok GROUP BY 1),
        |ranked AS (SELECT t.id, t.s, t.gram, t.occ,
        |    row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.gram, t.occ) AS rk
        |  FROM tok t JOIN dfreq d ON d.gram = t.gram),
        |pre AS (SELECT * FROM ranked WHERE rk <= 5),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM pre a JOIN pre b ON a.gram = b.gram AND a.occ = b.occ AND a.id < b.id)
        |SELECT c.id_a, c.id_b, CAST(levenshtein(pa.s, pb.s) AS INTEGER) AS dist
        |FROM cand c JOIN p pa ON pa.id = c.id_a JOIN p pb ON pb.id = c.id_b
        |WHERE abs(length(pa.s) - length(pb.s)) <= 2 AND levenshtein(pa.s, pb.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin),
      (s, d) => graft.operators.FuzzyJoin.qgramJoin(
          t(s, d).part.filter(col("p_partkey") % 20 === 0)
            .select("p_partkey", "p_name"),
          "p_partkey", "p_name", q = 2, maxDistance = 2)
        .orderBy("id_a", "id_b")),

    GraftQuery(
      // Persisted inverted index + conjunctive search (operators/
      // InvertedIndex): the corpus is tokenized and aggregated into
      // (term, doc, tf) postings ONCE (fixture-cached, dd11/ivf_loaded
      // discipline), written PARTITIONED BY a crc32 term bucket; the
      // query's bucket IN list prunes partition DIRECTORIES at the
      // storage layer (plan-gated in InvertedIndexSpec — the IvfIndex
      // discipline, immune to the planner disabling bucketed scans)
      // and the doc-keyed intersection is the only shuffle, sized by
      // matched postings, never the corpus. Oracle recomputes the
      // postings + intersection in SQL.
      "ir02_inverted_search",
      Some("""WITH p AS (
        |  SELECT doc_id, t AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS t
        |        FROM documents) q
        |  GROUP BY doc_id, t)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
        |FROM p WHERE term IN ('join', 'scan')
        |GROUP BY doc_id HAVING COUNT(*) = 2
        |ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.InvertedIndex.searchIndexed(
          s, invIndexLoaded(s, d), Seq("join", "scan"))
        .orderBy("doc_id")),

    GraftQuery(
      // Incremental inverted-index maintenance (ir03): the dd11
      // pattern for retrieval — the index is built from the historical
      // slice (doc_id % 10 != 0) and the nightly slice is APPENDED
      // (InvertedIndex.appendToIndex: only the new batch tokenized,
      // parquet append into the same term-bucket dirs). The search
      // through the incrementally-built index must hash-match the
      // oracle computed over the FULL corpus — a lost posting, a
      // double-counted doc, or a bucket mismatch all break it.
      "ir03_incremental_index",
      Some("""WITH p AS (
        |  SELECT doc_id, t AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS t
        |        FROM documents) q
        |  GROUP BY doc_id, t)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
        |FROM p WHERE term IN ('hash', 'row')
        |GROUP BY doc_id HAVING COUNT(*) = 2
        |ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.InvertedIndex.searchIndexed(
          s, invIndexIncremental(s, d), Seq("hash", "row"))
        .orderBy("doc_id")),

    GraftQuery(
      // Ranked (BM25) retrieval over the PERSISTED index (ir04):
      // ir01's scoring arithmetic composed with ir02's storage
      // locality — tf/dl from the bucket-pruned postings (dl is
      // denormalized into every posting row at build time), per-term
      // df counted from those same matched rows, and the two
      // corpus-level stats (N, Σdl) from the index metadata persisted
      // at build time. The oracle recomputes full-corpus BM25 in SQL
      // (the ir01 form, different terms) — a stale stat, lost posting,
      // or drifted dl all hash-mismatch. Terms span the df spectrum
      // (dup df≈5%, merge/window ≈78%) so idf weighting is exercised.
      "ir04_indexed_bm25",
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        |tf AS (SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        |  WHERE w IN ('merge', 'dup', 'window') GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.term,
        |    (CAST(FLOOR(ln((corpus.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * 1000000 + 0.5) AS BIGINT)
        |      / 1000000.0) * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
        |      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (CAST(corpus.sumdl AS DOUBLE) / corpus.n))) AS s
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
        |  ROUND((COALESCE(SUM(CASE WHEN term = 'merge' THEN s END), 0)
        |       + COALESCE(SUM(CASE WHEN term = 'dup' THEN s END), 0)
        |       + COALESCE(SUM(CASE WHEN term = 'window' THEN s END), 0)) * 10000) / 10000 + 0 AS score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.InvertedIndex.searchIndexedBm25(
          s, invIndexLoaded(s, d), Seq("merge", "dup", "window"))
        .orderBy("doc_id")),

    GraftQuery(
      // Reciprocal-rank fusion hybrid search (rr01): the RAG-stack
      // combiner — a lexical BM25 ranking (ir01 arithmetic) fused with
      // a vector cosine ranking (q26 arithmetic) by rank alone,
      // rrf = Σ 1/(60 + rank_i), fixed list order, absent → 0
      // (operators/Retrieval.rrfFuse). Ranks come from the two-phase
      // GlobalRank, not a single-partition window; both input scores
      // are the engine's bit-reproducible rounded forms, so ranks and
      // fusion hash-match the oracle. At sf0.1 the vector list covers
      // 2/5 of the corpus — the full-outer fusion semantics (docs in
      // any subset of lists) are load-bearing, not decorative.
      "rr01_rrf_hybrid",
      Some("""WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        |tf AS (SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        |  WHERE w IN ('merge', 'vector') GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.term,
        |    (CAST(FLOOR(ln((corpus.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * 1000000 + 0.5) AS BIGINT)
        |      / 1000000.0) * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
        |      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (CAST(corpus.sumdl AS DOUBLE) / corpus.n))) AS s
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus),
        |bm AS (SELECT doc_id,
        |    ROUND((COALESCE(SUM(CASE WHEN term = 'merge' THEN s END), 0)
        |         + COALESCE(SUM(CASE WHEN term = 'vector' THEN s END), 0)) * 10000) / 10000 + 0 AS score
        |  FROM sc GROUP BY doc_id),
        |probe AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT e.vec_id AS doc_id,
        |    ROUND((list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pe) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(p.pe, p.pe)))) * 10000) / 10000 + 0 AS score
        |  FROM embeddings e CROSS JOIN probe p WHERE e.vec_id <> 0),
        |r0 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_0 FROM bm),
        |r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_1 FROM cos),
        |f AS (SELECT COALESCE(r0.doc_id, r1.doc_id) AS doc_id, r0.rank_0, r1.rank_1
        |  FROM r0 FULL JOIN r1 ON r1.doc_id = r0.doc_id)
        |SELECT doc_id, rank_0, rank_1,
        |  ROUND((COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_0), 0) +
        |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_1), 0)) * 1000000) / 1000000 + 0 AS rrf
        |FROM f ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import graft.functions.{cosine_similarity, roundFp}
        val bm = TextAnalysis.bm25(t(s, d).documents, Seq("merge", "vector"))
          .select(col("doc_id"), col("score"))
        val probe = t(s, d).embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>").as("pe"))
        val cos = t(s, d).embeddings.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(col("vec_id").as("doc_id"),
            roundFp(cosine_similarity(col("embedding").cast("array<double>"), col("pe")), 4)
              .as("score"))
        graft.operators.Retrieval.rrfFuse(Seq(bm, cos)).orderBy("doc_id")
      }),

    GraftQuery(
      // Native Jaro–Winkler scoring (functions/JaroWinkler — a codegen'd
      // Catalyst expression; Spark has no JW built-in and a UDF would
      // break whole-stage codegen) over the sorted-neighborhood blocking
      // (FuzzyJoin.neighborhoodCandidates). Exact-equal names are
      // excluded so the entry exercises the actual similarity surface —
      // the algorithm is pinned bit-exact to DuckDB's
      // jaro_winkler_similarity (JaroWinklerSpec fuzz), making the
      // threshold comparison and the round6 output cross-engine stable.
      "fz03_jaro_winkler",
      Some("""WITH r AS (SELECT p_partkey, p_name,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS rn FROM part)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS s_a, b.p_name AS s_b,
        |  ROUND(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000) / 1000000 + 0 AS jw
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
        |WHERE a.p_name <> b.p_name
        |  AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin),
      (s, d) => {
        val jw = graft.functions.jaro_winkler(col("s_a"), col("s_b"))
        graft.operators.FuzzyJoin.neighborhoodCandidates(
            t(s, d).part, "p_partkey", "p_name", window = 3)
          .filter(col("s_a") =!= col("s_b") && jw >= 0.8)
          .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
            graft.functions.roundFp(jw, 6).as("jw"))
          .orderBy("id_a", "id_b")
      }),

    GraftQuery(
      // EXACT Jaro–Winkler-threshold join (fz04): the jw-bound sibling
      // of fz02 — character-overlap prefix blocking derived from the
      // Jaro definition (jw >= 0.9 forces jaro >= (0.9-0.4)/0.6, which
      // bounds shared characters and partner length), candidates from
      // a rarest-char-first prefix equi-join, the codegen'd
      // jaro_winkler expression as the exact verify. Complete recall
      // is spec-gated against all-pairs truth (FuzzyJoinSpec); the
      // oracle brute-forces the %20 slice (measuring the operator, not
      // output volume — the fz02 discipline).
      "fz04_jw_threshold_join",
      Some("""WITH p AS (SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey % 20 = 0)
        |SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b,
        |  ROUND(jaro_winkler_similarity(a.s, b.s) * 1000000) / 1000000 + 0 AS jw
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE jaro_winkler_similarity(a.s, b.s) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin),
      (s, d) => graft.operators.FuzzyJoin.jaroWinklerJoin(
          t(s, d).part.filter(col("p_partkey") % 20 === 0)
            .select("p_partkey", "p_name"),
          "p_partkey", "p_name", threshold = 0.9)
        .orderBy("id_a", "id_b")),

    GraftQuery(
      // End-to-end entity resolution (er01): the capstone composition
      // of the similarity stack — EXACT Jaro-Winkler blocking+verify
      // (fz04's jaroWinklerJoin, complete recall), transitive closure
      // via the log-round connected components (dd08), min-id
      // survivorship — one canonical-id mapping for EVERY entity,
      // singletons mapping to themselves. Every stage is an existing
      // scale-shaped operator; the entry proves they compose. Oracle:
      // brute-force pair truth + a recursive-CTE closure (the dd08
      // pattern) — an algorithm-independent cross-check of the whole
      // pipeline.
      "er01_entity_resolution",
      Some("""WITH RECURSIVE p AS (SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey % 20 = 0),
        |pr AS (SELECT a.id AS ia, b.id AS ib FROM p a JOIN p b ON a.id < b.id
        |  WHERE jaro_winkler_similarity(a.s, b.s) >= 0.9),
        |edges AS (SELECT ia AS s, ib AS d FROM pr UNION SELECT ib, ia FROM pr),
        |reach AS (SELECT s, d FROM edges
        |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT p.id AS entity_id,
        |  CAST(COALESCE(LEAST(p.id, m.mn), p.id) AS BIGINT) AS canonical_id
        |FROM p LEFT JOIN (SELECT s AS id, MIN(d) AS mn FROM reach GROUP BY 1) m
        |  ON m.id = p.id
        |ORDER BY entity_id""".stripMargin),
      (s, d) => {
        val slice = t(s, d).part.filter(col("p_partkey") % 20 === 0)
          .select("p_partkey", "p_name")
        val pairs = graft.operators.FuzzyJoin.jaroWinklerJoin(
            slice, "p_partkey", "p_name", threshold = 0.9)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        val comps = TextDedup.connectedComponents(pairs)
          .withColumnRenamed("doc_id", "entity_id")
        slice.select(col("p_partkey").as("entity_id"))
          .join(comps, Seq("entity_id"), "left")
          .select(col("entity_id"),
            coalesce(col("component"), col("entity_id")).as("canonical_id"))
          .orderBy("entity_id")
      }),

    GraftQuery(
      // Gap-based sessionization (operators/Sessions): lag + cumulative
      // sum over ONE user-keyed window (single Exchange, both window
      // functions in one Window operator), then a per-session hash
      // aggregate — output |sessions|. 6 h gap; value summed in exact
      // integer milli-units (house FP discipline).
      "se01_sessionize",
      Some("""WITH o AS (
        |  SELECT user_id, event_id, ts, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vu,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, vu,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id, MIN(ts) AS session_start,
        |  MAX(ts) AS session_end, COUNT(*) AS n_events, CAST(SUM(vu) AS BIGINT) AS sum_units
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin),
      (s, d) => {
        val ev = t(s, d).events.withColumn("vu",
          floor(col("value") * 1000 + 0.5).cast("long"))
        graft.operators.Sessions.sessionStats(
          graft.operators.Sessions.assignSessions(
            ev, "user_id", "ts", "event_id", gapSeconds = 21600L),
          "user_id", "ts", "vu")
          .orderBy("user_id", "session_id")
      }),

    GraftQuery(
      // First-order Markov transition matrix (operators/Sessions): one
      // user-keyed lead window + one hash aggregate on the type pair;
      // output bounded by |event types|² whatever the event volume.
      // Probability = exact-long ratio, round4.
      "nx01_transitions",
      Some("""WITH pr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n
        |      FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) * 10000) / 10000 + 0 AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin),
      (s, d) => graft.operators.Sessions.transitions(
          t(s, d).events, "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")),

    GraftQuery(
      // Step-decayed recency score (operators/TimeSeries.decayedSum):
      // per-(key, day) totals decay by arithmetic right shift per whole
      // 7-day half-life — NO floating point anywhere, bitwise identical
      // under any partitioning (the pg01 integer discipline). One raw
      // scan into a |keys × days| working set, one keyed aggregate.
      "ts03_decayed_sum",
      Some("""WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS u
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT MAX(day) AS ref FROM daily)
        |SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(SUM(u) AS BIGINT) AS raw_units,
        |  CAST(SUM(CASE WHEN date_diff('day', day, ref) // 7 >= 63 THEN 0
        |    ELSE u // (CAST(1 AS BIGINT) << (date_diff('day', day, ref) // 7)) END) AS BIGINT) AS decayed_units
        |FROM daily, r GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => graft.operators.TimeSeries.decayedSum(
          t(s, d).events.withColumn("vu",
            floor(col("value") * 1000 + 0.5).cast("long")),
          "user_id", "ts", "vu", halfLifeDays = 7)
        .orderBy("user_id")),

    GraftQuery(
      // Rolling z-score anomaly detection (ts04, operators/TimeSeries):
      // flag events > 3σ from their own 30-event trailing baseline —
      // with EXACT integer moments the test is division- and
      // sqrt-free ((v·n−s)² > T²·(n·ss−s²); denominators cancel), so
      // an inherently-FP statistic becomes bitwise deterministic. All
      // three moment windows share one user-keyed Window operator
      // (plan-gated); the baseline excludes the current row.
      "ts04_rolling_zscore",
      Some("""WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events),
        |m AS (SELECT user_id, event_id, v,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(v) OVER w AS BIGINT) AS s,
        |    CAST(SUM(v * v) OVER w AS BIGINT) AS ss
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, v AS units, n AS base_n,
        |  ((v * n - s) * (v * n - s) * 100) // (n * ss - s * s) AS zsq_centi
        |FROM m
        |WHERE n >= 10 AND (n * ss - s * s) > 0
        |  AND (v * n - s) * (v * n - s) > 9 * (n * ss - s * s)
        |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => graft.operators.TimeSeries.rollingZscore(
          t(s, d).events.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("vu")),
          "user_id", "ts", "event_id", "vu",
          window = 30, minBaseline = 10, threshold = 3)
        .orderBy("user_id", "event_id")),

    GraftQuery(
      // Streaming SCD2 dimension maintenance (st13,
      // StatefulOps.scd2StreamTtl): the stream twin of up02, TTL-first.
      // State holds each key's RAW change history (bounded by change
      // count — the SCD2 regime) because a LATE mid-timeline change
      // both creates a version and can re-suppress a later one;
      // each touched key re-derives and emits its full timeline, the
      // replay keeps the last emission per key, and the result must
      // hash-match the batch scd2 oracle under the standard
      // late-displacement chunking.
      "st13_stream_scd2",
      Some("""WITH h AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    o_orderpriority,
        |    LAG(o_orderpriority) OVER (
        |      PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev,
        |    LAG(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
        |  FROM orders),
        |c AS (SELECT * FROM h WHERE prev_d IS NULL OR prev IS DISTINCT FROM o_orderpriority)
        |SELECT o_custkey AS custkey, o_orderkey AS change_id, o_orderpriority AS priority,
        |  d AS valid_from_days,
        |  LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS valid_to_days,
        |  LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) IS NULL AS is_current
        |FROM c ORDER BY custkey, valid_from_days, change_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.scd2Replay(
          s, t(s, d).orders.select(
            col("o_custkey").as("key"), col("o_orderkey").as("change_id"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("ts_days"),
            col("o_orderpriority").as("attr")), nChunks = 4)),

    GraftQuery(
      // Stream-static broadcast enrichment (st12): the one STATELESS
      // replay — facts on the stream, the customer dimension broadcast
      // on the batch side, the most common production streaming shape.
      // No state, no watermark: every event must be enriched exactly
      // as the batch left join would, under the standard
      // late-displacement chunking (arrival order must not matter);
      // the harness additionally asserts no row is dropped or
      // duplicated.
      "st12_stream_enrich",
      Some("""SELECT e.event_id, e.user_id, CAST(c.c_nationkey AS BIGINT) AS nation
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY event_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.enrichReplay(
          s, t(s, d).events.select("user_id", "event_id"),
          t(s, d).customer.select(col("c_custkey").as("user_id"),
            col("c_nationkey").as("nation")), nChunks = 4)),

    GraftQuery(
      // Per-key integer EWMA (ts05, TimeSeries.ewmaMilli): the
      // smoothing/level-estimate primitive. EWMA is a non-associative
      // recursion, so the exact form is an explicitly ordered per-key
      // array + a left fold — `aggregate` HOF in Spark, `list_reduce`
      // in DuckDB, both running the identical integer milli-unit
      // recursion (α = 2/10). Per-key array memory is the documented
      // axis; one shuffle.
      "ts05_ewma",
      Some("""WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    list(v ORDER BY ts, event_id) AS vs FROM e GROUP BY 1)
        |SELECT user_id, n_events,
        |  CAST(list_reduce(list_prepend(vs[1] * 1000, vs[2:len(vs)]),
        |    (acc, x) -> (2 * x * 1000 + 8 * acc) // 10) AS BIGINT) AS ewma_milli
        |FROM a ORDER BY user_id""".stripMargin),
      (s, d) => graft.operators.TimeSeries.ewmaMilli(
          t(s, d).events.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("vu")),
          "user_id", "ts", "event_id", "vu", alphaNum = 2, alphaDen = 10)
        .orderBy("user_id")),

    GraftQuery(
      // Streaming rolling z-score on ingest (st11): the stream twin of
      // ts04 through StatefulOps.rollingZscoreStreamTtl — per-key ring
      // state (≤ window longs), exact integer test, built TTL-FIRST
      // (EventTimeTimeout; eviction spec-gated in StatefulTtlSpec).
      // The replay feeds (ts, event_id)-ordered chunks — a positional
      // window is order-sensitive, so in-order-equals-batch IS the
      // contract (see zscoreReplay) — and must hash-match the same
      // DuckDB oracle as ts04.
      "st11_stream_zscore",
      Some("""WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events),
        |m AS (SELECT user_id, event_id, v,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(v) OVER w AS BIGINT) AS s,
        |    CAST(SUM(v * v) OVER w AS BIGINT) AS ss
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, v AS units, n AS base_n,
        |  ((v * n - s) * (v * n - s) * 100) // (n * ss - s * s) AS zsq_centi
        |FROM m
        |WHERE n >= 10 AND (n * ss - s * s) > 0
        |  AND (v * n - s) * (v * n - s) > 9 * (n * ss - s * s)
        |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => graft.streaming.StreamReplay.zscoreReplay(
          s, t(s, d).events.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("vu")),
          window = 30, minBaseline = 10, threshold = 3, nChunks = 4)),

    GraftQuery(
      // Declarative data-quality expectations (operators/Quality): all
      // row-level rules over a table fuse into ONE conditional-sum scan;
      // uniqueness is one keyed agg, referential integrity one
      // (broadcast-able) anti join. Report = |rules| rows. The rule set
      // mixes passing and failing rules so both report paths are
      // exercised.
      "dq01_expectations",
      Some("""WITH u AS (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey),
        |uc AS (SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey),
        |t1 AS (
        |SELECT 'o_custkey_not_null' AS rule,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  COUNT(*) AS total FROM orders
        |UNION ALL
        |SELECT 'o_totalprice_range',
        |  CAST(SUM(CASE WHEN NOT (o_totalprice >= 0 AND o_totalprice <= 450000)
        |            OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus_accepted',
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O')
        |            OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM orders
        |UNION ALL
        |SELECT 'o_orderkey_unique',
        |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM u),
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM u)
        |UNION ALL
        |SELECT 'o_custkey_unique',
        |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM uc),
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM uc)
        |UNION ALL
        |SELECT 'l_discount_range',
        |  CAST(SUM(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.1)
        |            OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity_positive',
        |  CAST(SUM(CASE WHEN NOT COALESCE(l_quantity >= 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_orders_fk',
        |  (SELECT COUNT(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL),
        |  (SELECT COUNT(*) FROM lineitem)
        |)
        |SELECT rule, violations, total, CAST(violations = 0 AS BOOLEAN) AS pass
        |FROM t1 ORDER BY rule""".stripMargin),
      (s, d) => {
        import graft.operators.Quality._
        val orders = t(s, d).orders
        val li = t(s, d).lineitem
        val ordersReport = expectations(orders, Seq(
          NotNull("o_custkey_not_null", "o_custkey"),
          InRange("o_totalprice_range", "o_totalprice", 0, 450000),
          AcceptedValues("o_orderstatus_accepted", "o_orderstatus", Seq("F", "O")),
          Unique("o_orderkey_unique", Seq("o_orderkey")),
          Unique("o_custkey_unique", Seq("o_custkey"))))
        val liReport = expectations(li, Seq(
          InRange("l_discount_range", "l_discount", 0, 0.1),
          Check("l_quantity_positive", col("l_quantity") >= 1),
          ForeignKey("lineitem_orders_fk", "l_orderkey", orders, "o_orderkey")))
        ordersReport.unionAll(liReport).orderBy("rule")
      }),

    GraftQuery(
      // Multi-table expectation suite (dq02): Quality.suite compiles a
      // declarative spec spanning customer/orders/lineitem into ONE
      // report — per table the row-level rules still fuse into one
      // conditional-sum scan (plan-gated in QualitySpec), ForeignKeyRef
      // resolves its parent by suite table name, and CountRatio
      // reconciles row counts across tables via 1-row count aggregates
      // (lineitem must hold >= 3.5× orders rows).
      "dq02_suite",
      Some("""WITH u AS (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey),
        |oc AS (SELECT COUNT(*) AS c FROM orders),
        |lc AS (SELECT COUNT(*) AS c FROM lineitem),
        |t1 AS (
        |SELECT 'customer' AS tbl, 'c_acctbal_range' AS rule,
        |  CAST(SUM(CASE WHEN NOT (c_acctbal >= -1000 AND c_acctbal <= 10000)
        |            OR c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  COUNT(*) AS total FROM customer
        |UNION ALL
        |SELECT 'orders', 'o_totalprice_range',
        |  CAST(SUM(CASE WHEN NOT (o_totalprice >= 0 AND o_totalprice <= 300000)
        |            OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM orders
        |UNION ALL
        |SELECT 'orders', 'o_orderkey_unique',
        |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM u),
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM u)
        |UNION ALL
        |SELECT 'lineitem', 'li_quantity_pos',
        |  CAST(SUM(CASE WHEN NOT COALESCE(l_quantity >= 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem', 'li_orders_fk',
        |  (SELECT COUNT(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL),
        |  (SELECT c FROM lc)
        |UNION ALL
        |SELECT 'lineitem', 'li_volume',
        |  GREATEST(0, CAST(CEIL(3.5 * (SELECT c FROM oc)) AS BIGINT) - (SELECT c FROM lc)),
        |  (SELECT c FROM lc)
        |)
        |SELECT tbl AS "table", rule, violations, total,
        |  CAST(violations = 0 AS BOOLEAN) AS pass
        |FROM t1 ORDER BY "table", rule""".stripMargin),
      (s, d) => {
        import graft.operators.Quality._
        suite(
          Map("customer" -> t(s, d).customer, "orders" -> t(s, d).orders,
            "lineitem" -> t(s, d).lineitem),
          Seq(
            TableRules("customer", Seq(
              InRange("c_acctbal_range", "c_acctbal", -1000, 10000))),
            TableRules("orders", Seq(
              InRange("o_totalprice_range", "o_totalprice", 0, 300000),
              Unique("o_orderkey_unique", Seq("o_orderkey")))),
            TableRules("lineitem", Seq(
              Check("li_quantity_pos", col("l_quantity") >= 1),
              ForeignKeyRef("li_orders_fk", "l_orderkey", "orders", "o_orderkey"),
              CountRatio("li_volume", "orders", minRatio = 3.5)))))
          .orderBy("table", "rule")
      }),

    GraftQuery(
      // Distributed OLS by sufficient statistics (operators/Regression):
      // exact integer moment sums in ONE hash aggregate (map-side
      // combinable), closed form on the |groups| result rows — the
      // "aggregate the moments, solve tiny" pattern that fits a
      // regression over 100 TB in a single pass. Fit: extendedprice
      // cents ~ quantity units per returnflag.
      "ml01_linear_fit",
      // yu is WHOLE currency units, not cents (round-15 change): the
      // r² path squares yu, and Σyu² at cent quantization overflows
      // long at sf1 (measured: SparkArithmeticException in Sf1BenchAll)
      // — exactly the operator's documented "re-quantize coarser for
      // bigger groups" contract. Whole units hold to ~sf100.
      Some("""WITH q AS (SELECT l_returnflag AS grp,
        |    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS xu,
        |    CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS yu FROM lineitem),
        |m AS (SELECT grp, COUNT(*) AS n, CAST(SUM(xu) AS BIGINT) AS sx,
        |    CAST(SUM(yu) AS BIGINT) AS sy, CAST(SUM(xu * xu) AS BIGINT) AS sxx,
        |    CAST(SUM(xu * yu) AS BIGINT) AS sxy, CAST(SUM(yu * yu) AS BIGINT) AS syy
        |  FROM q GROUP BY 1),
        |f AS (SELECT grp, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT grp, n,
        |  ROUND((cov / vx) * 1000000) / 1000000 + 0 AS slope,
        |  ROUND(((syd - cov / vx * sxd) / CAST(n AS DOUBLE)) * 1000000) / 1000000 + 0 AS intercept,
        |  ROUND((cov * cov / (vx * vy)) * 1000000) / 1000000 + 0 AS r2
        |FROM f ORDER BY grp""".stripMargin),
      (s, d) => graft.operators.Regression.fitPerGroup(
          t(s, d).lineitem.select(col("l_returnflag").as("grp"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("xu"),
            floor(col("l_extendedprice") + 0.5).cast("long").as("yu")),
          Seq("grp"), "xu", "yu")
        .orderBy("grp")),

    GraftQuery(
      // Multi-feature OLS (ml02): price = β1·quantity + β2·discount + β0
      // per returnflag, via Regression.fitOlsExactPerGroup — the
      // normal-equations solve done EXACTLY: integer-unit moments, 3×3
      // Cramer determinants in decimal(38,0) (Spark) / HUGEINT
      // (DuckDB). Exact integers make the solve order-free — the two
      // engines agree bit-for-bit up to the single final det ratio
      // (one correctly-rounded conversion + divide), unlike a float
      // Gaussian elimination, which is why THIS instance carries the
      // driver gate and the general-k float fitOls is pinned to it in
      // RegressionSpec. One hash aggregation, |groups| rows out.
      "ml02_multifeature_ols",
      Some("""WITH q AS (SELECT l_returnflag AS grp,
        |    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
        |    CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y FROM lineitem),
        |m AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
        |    CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(x1 * x1) AS HUGEINT) AS s11, CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
        |    CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
        |    CAST(SUM(x1 * y) AS HUGEINT) AS s1y, CAST(SUM(x2 * y) AS HUGEINT) AS s2y
        |  FROM q GROUP BY 1),
        |d AS (SELECT grp, n,
        |    s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1) + s1 * (s12 * s2 - s22 * s1) AS det,
        |    s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy) + s1 * (s2y * s2 - s22 * sy) AS det1,
        |    s11 * (s2y * n - s2 * sy) - s1y * (s12 * n - s2 * s1) + s1 * (s12 * sy - s2y * s1) AS det2,
        |    s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1) + s1y * (s12 * s2 - s22 * s1) AS det0
        |  FROM m)
        |SELECT grp, CAST(n AS BIGINT) AS n,
        |  ROUND((CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta1,
        |  ROUND((CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta2,
        |  ROUND((CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta0
        |FROM d ORDER BY grp""".stripMargin),
      (s, d) => graft.operators.Regression.fitOlsExactPerGroup(
          t(s, d).lineitem.select(col("l_returnflag").as("grp"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("x1"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y")),
          Seq("grp"), "x1", "x2", "y")
        .orderBy("grp")),

    GraftQuery(
      // Frequent co-occurrence pairs (fp01, operators/Baskets): the
      // 2-itemset Apriori level over order baskets — items below the
      // support floor are dropped BEFORE the within-basket self-join
      // (monotonicity: a pair's support can't exceed either item's),
      // which is the prune that bounds the pairing at scale. Exact
      // integer counting, set semantics per basket; basket width (≤13
      // parts/order here) bounds the per-basket C(k,2).
      "fp01_frequent_pairs",
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |fi AS (SELECT it FROM b GROUP BY it HAVING COUNT(*) >= 2),
        |k AS (SELECT bk, it FROM b WHERE it IN (SELECT it FROM fi))
        |SELECT a.it AS item_a, c.it AS item_b, CAST(COUNT(*) AS BIGINT) AS support
        |FROM k a JOIN k c ON a.bk = c.bk AND a.it < c.it
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY item_a, item_b""".stripMargin),
      (s, d) => graft.operators.Baskets.frequentPairs(
          t(s, d).lineitem.select(col("l_orderkey").as("basket_id"),
            col("l_partkey").as("item")),
          minSupport = 2)
        .orderBy("item_a", "item_b")),

    GraftQuery(
      // Cross-corpus duplicated-span statistics (dd12,
      // TextDedup.duplicatedSpanStats): the measurable half of
      // exact-substring dedup — per doc, the fraction of its 8-token
      // windows occurring anywhere else in the corpus (including
      // within-doc repeats). Window identity is md5 of the joined
      // window (invariant #3); one hash-keyed count + a co-partitioned
      // join back + one doc-keyed reduction; short docs report zero
      // windows via the doc-universe left join.
      "dd12_duplicated_spans",
      Some("""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS t FROM documents),
        |w AS (SELECT doc_id, md5(array_to_string(t[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS h
        |  FROM toks, unnest(range(1, greatest(len(t) - 6, 1))) AS r(i)),
        |c AS (SELECT h, COUNT(*) AS cnt FROM w GROUP BY 1),
        |d AS (SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM w JOIN c USING (h) GROUP BY 1)
        |SELECT toks.doc_id, COALESCE(d.n_windows, 0) AS n_windows,
        |  COALESCE(d.n_dup, 0) AS n_dup_windows,
        |  CASE WHEN d.n_windows > 0 THEN
        |    ROUND((CAST(d.n_dup AS DOUBLE) / d.n_windows) * 1000000) / 1000000 + 0
        |  END AS dup_frac
        |FROM toks LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, d) => TextDedup.duplicatedSpanStats(
          t(s, d).documents.select("doc_id", "text"), n = 8)
        .orderBy("doc_id")),

    GraftQuery(
      // Grid-bucketed spatial radius join (sp01, operators/Spatial):
      // the geospatial member of the blocked-join family. Coordinates
      // are key-hashed integer micro-degrees (no geo columns in the
      // testdata; the hash spreads keys over the full globe) and the
      // metric is planar squared euclidean in micro-degrees — exact
      // long arithmetic end to end, deliberately NOT haversine
      // (cross-engine sin/cos ulps could flip a threshold compare).
      // The left side fans out to its 3x3 neighbor cells, the right
      // keys by its exact cell, one equi-join + exact verify; floor
      // division is spelled explicitly so negative coordinates tile
      // identically in both engines.
      "sp01_radius_join",
      Some("""WITH c AS (SELECT c_custkey AS left_id,
        |    (c_custkey * 2654435761 % 180000000) - 90000000 AS lat,
        |    (c_custkey * 2246822519 % 360000000) - 180000000 AS lon FROM customer),
        |s AS (SELECT s_suppkey AS right_id,
        |    (s_suppkey * 2654435761 % 180000000) - 90000000 AS lat,
        |    (s_suppkey * 2246822519 % 360000000) - 180000000 AS lon FROM supplier)
        |SELECT c.left_id, s.right_id,
        |  CAST((c.lat - s.lat) * (c.lat - s.lat) +
        |       (c.lon - s.lon) * (c.lon - s.lon) AS BIGINT) AS dist_sq_u
        |FROM c JOIN s ON (c.lat - s.lat) * (c.lat - s.lat) +
        |  (c.lon - s.lon) * (c.lon - s.lon) <= CAST(2000000 AS BIGINT) * 2000000
        |ORDER BY left_id, right_id""".stripMargin),
      (s, d) => graft.operators.Spatial.radiusJoin(
          t(s, d).customer.select(col("c_custkey").as("left_id"),
            (col("c_custkey") * 2654435761L % 180000000L - 90000000L).as("lat_u"),
            (col("c_custkey") * 2246822519L % 360000000L - 180000000L).as("lon_u")),
          t(s, d).supplier.select(col("s_suppkey").as("right_id"),
            (col("s_suppkey") * 2654435761L % 180000000L - 90000000L).as("lat_u"),
            (col("s_suppkey") * 2246822519L % 360000000L - 180000000L).as("lon_u")),
          radiusMicro = 2000000L, cellMicro = 2000000L)
        .orderBy("left_id", "right_id")),

    GraftQuery(
      // Two-proportion pooled z-test per experiment (ab01,
      // operators/Experiments): A/B conversion analysis with the z²
      // statistic as a RATIO OF EXACT INTEGERS (decimal(38,0) /
      // HUGEINT — the ml02 discipline; the only FP is the final
      // conversion + divide), so significance decisions are bitwise
      // cross-engine. Experiments/variants derive deterministically
      // from user_id; conversion = any 'purchase' event. No p-value on
      // purpose: erf differs across engines in ulps, z² against the
      // χ²₁ critical value does not.
      "ab01_ab_test",
      Some("""WITH pu AS (SELECT user_id % 5 AS experiment, (user_id // 5) % 2 AS variant,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT experiment,
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
        |    CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_control,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
        |    CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_treatment
        |  FROM pu GROUP BY 1),
        |z AS (SELECT *,
        |    CAST(x_control AS HUGEINT) * n_treatment - CAST(x_treatment AS HUGEINT) * n_control AS diff,
        |    CAST(n_control AS HUGEINT) + n_treatment AS n,
        |    CAST(x_control AS HUGEINT) + x_treatment AS x
        |  FROM a),
        |zz AS (SELECT experiment, n_control, x_control, n_treatment, x_treatment,
        |    CASE WHEN CAST(n_control AS HUGEINT) * n_treatment * x * (n - x) > 0 THEN
        |      ROUND((CAST(diff * diff * n AS DOUBLE) /
        |             CAST(CAST(n_control AS HUGEINT) * n_treatment * x * (n - x) AS DOUBLE)) * 1000000) / 1000000 + 0
        |    END AS zsq
        |  FROM z)
        |SELECT experiment, n_control, x_control, n_treatment, x_treatment, zsq,
        |  CASE WHEN zsq IS NOT NULL THEN zsq > 3.841459 END AS significant
        |FROM zz ORDER BY experiment""".stripMargin),
      (s, d) => graft.operators.Experiments.twoProportionZ(
          t(s, d).events
            .groupBy(col("user_id"))
            .agg(max(when(col("event_type") === "purchase", true).otherwise(false))
              .as("converted"))
            .select((col("user_id") % 5).as("experiment"),
              expr("(user_id DIV 5) % 2").as("variant"), col("converted")))
        .orderBy("experiment")),

    GraftQuery(
      // Deterministic Lloyd k-means over the embedding corpus (km01):
      // KMeansExact — the PageRank integer discipline applied to
      // clustering. Components quantize to micro-units, distances and
      // centroid updates are exact integers (sum DIV count truncates
      // identically in Spark DIV and DuckDB //, probed), argmin ties
      // break on cluster id — so assignments are bitwise deterministic
      // under any partitioning, unlike MLlib's float k-means
      // (IvfIndex's build). k=4, 2 iterations, init = vectors of the 4
      // smallest ids; the oracle unrolls both iterations.
      "km01_kmeans_assign",
      Some("""WITH v AS (SELECT vec_id AS id, i,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
        |c0 AS (SELECT CAST(id AS INTEGER) AS cl, i, x AS c FROM v WHERE id < 4),
        |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
        |s1 AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
        |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
        |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
        |s2 AS (SELECT id, cl, dist FROM (SELECT id, cl, dist,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1)
        |SELECT id, cl AS cluster, dist AS dist_u FROM s2 ORDER BY id""".stripMargin),
      (s, d) => graft.operators.KMeansExact.assignMicro(
          t(s, d).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec")),
          d = 64, k = 4, iterations = 2)
        .orderBy("id")),

    GraftQuery(
      // SemDeDup-style semantic dedup (sd01, Similarity.semanticDedup):
      // km01's deterministic k-means as the blocking step, then an
      // in-cluster cosine pair join drops every vector with a lower-id
      // near-duplicate at >= 0.3 — the embedding-space curation dedup
      // (Abbas et al. 2023) as one relational composition. Pair volume
      // is Σ C(|cluster|,2), never N², and cluster size is a GUARDED
      // quadratic axis (maxClusterSize raise_error — the Baskets
      // basket-width discipline). The oracle unrolls the same two
      // k-means iterations as km01, then runs the textbook in-cluster
      // dominance anti-join.
      "sd01_semantic_dedup",
      Some("""WITH v AS (SELECT vec_id AS id, i,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
        |c0 AS (SELECT CAST(id AS INTEGER) AS cl, i, x AS c FROM v WHERE id < 4),
        |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
        |s1 AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
        |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
        |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
        |s2 AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |wc AS (SELECT s2.id AS vec_id, s2.cl AS cluster, e.e
        |  FROM s2 JOIN e ON e.vec_id = s2.id),
        |dup AS (SELECT DISTINCT a.vec_id
        |  FROM wc a JOIN wc b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        |  WHERE list_dot_product(a.e, b.e) /
        |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.3)
        |SELECT vec_id, cluster FROM wc
        |WHERE vec_id NOT IN (SELECT vec_id FROM dup)
        |ORDER BY vec_id""".stripMargin),
      (s, d) => graft.operators.Similarity.semanticDedup(
          t(s, d).embeddings, d = 64, k = 4, iterations = 2, threshold = 0.3)
        .orderBy("vec_id")),

    GraftQuery(
      // INCREMENTAL semantic dedup (sd02, Similarity
      // .semanticDedupIncremental): the dd11/ir03 nightly-batch
      // discipline applied to sd01 — the "historical" slice
      // (vec_id % 10 != 0) is fitted + deduped ONCE into a persisted
      // index (centroids = the exact geometry the corpus assignments
      // used, KMeansExact.fitMicro); the batch (vec_id % 10 == 0)
      // assigns against those BROADCAST centroids (no corpus re-fit)
      // and drops rows near a same-cluster corpus vector or a
      // lower-id same-cluster batch row. The oracle recomputes the
      // whole derivation: historical 2-iteration Lloyd with generic
      // 4-smallest-id init, batch argmin against the
      // after-one-update centroids, both dominance joins.
      "sd02_incremental_semantic_dedup",
      Some(Sd02Oracle),
      (s, d) => graft.operators.Similarity.semanticDedupIncremental(
          t(s, d).embeddings.filter(col("vec_id") % 10 === 0)
            .select("vec_id", "embedding"),
          semIndexLoaded(s, d), threshold = 0.3)
        .orderBy("vec_id")),

    GraftQuery(
      // STREAMING semantic dedup on ingest (st14, r16 directive #5):
      // the sd02 nightly batch running INSIDE a streaming query —
      // broadcast-centroid assignment as a pure projection, the
      // corpus-dominance half as a stateless stream-static cluster
      // equi-join, the batch-vs-batch half as cluster-keyed state
      // emitting the higher id of each near pair when its second
      // member arrives (drop emission is arrival-order-invariant where
      // survivor emission could not be). Gated by sd02's ORACLE
      // VERBATIM (one SQL text, shared val — the BandCte discipline):
      // the streamed survivors must equal the batch derivation on any
      // chunking.
      "st14_stream_semantic_dedup",
      Some(Sd02Oracle),
      (s, d) => graft.streaming.StreamReplay.semanticDedupReplay(
          s, t(s, d).embeddings.filter(col("vec_id") % 10 === 0)
            .select("vec_id", "embedding"),
          semIndexLoaded(s, d), threshold = 0.3, nChunks = 4)
        .orderBy("vec_id")),


    GraftQuery(
      // Product quantization + asymmetric-distance search (pq01,
      // operators/ProductQuantizer — Jégou et al. 2011): 64-dim
      // vectors → 4 subspaces × 4-centroid integer codebooks (the
      // KMeansExact discipline PER SUBSPACE), candidates scored by m
      // lookups into the probe's precomputed m·k distance table —
      // N·m code rows + one id-keyed sum instead of N·d arithmetic,
      // the memory/bandwidth rung under 100 TB ANN. Everything is
      // exact integer (quantized components, integer Lloyd, integer
      // ADC sums), so unlike recall-banded ANN this gets a full hash
      // oracle: the SQL unrolls both Lloyd iterations per subspace
      // and recomputes the ADC table.
      "pq01_product_quantization",
      Some("""WITH v AS (SELECT vec_id AS id,
        |    CAST((i - 1) // 16 AS INTEGER) AS sub, CAST((i - 1) % 16 AS INTEGER) AS j,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
        |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
        |c0 AS (SELECT v.sub, init.cl, v.j, v.x AS c FROM v JOIN init USING (id)),
        |a1 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.sub, s1.cl, v.j, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 ON s1.id = v.id AND s1.sub = v.sub GROUP BY 1, 2, 3),
        |c1 AS (SELECT c0.sub, c0.cl, c0.j, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.sub = c0.sub AND c1u.cl = c0.cl AND c1u.j = c0.j),
        |a2 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s2 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |pt AS (SELECT c1.sub, c1.cl, CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS pdist
        |  FROM c1 JOIN (SELECT sub, j, x FROM v WHERE id = 0) p
        |    ON p.sub = c1.sub AND p.j = c1.j
        |  GROUP BY 1, 2),
        |adc AS (SELECT s2.id AS vec_id, CAST(SUM(pt.pdist) AS BIGINT) AS dist_u
        |  FROM s2 JOIN pt ON pt.sub = s2.sub AND pt.cl = s2.cl
        |  WHERE s2.id <> 0 GROUP BY 1)
        |SELECT vec_id, dist_u FROM adc ORDER BY dist_u, vec_id LIMIT 10""".stripMargin),
      (s, d) => graft.operators.ProductQuantizer.adcTopK(
          t(s, d).embeddings, probeId = 0L, topK = 10,
          d = 64, m = 4, k = 4, iterations = 2)),

    GraftQuery(
      // PQ search against the PERSISTED index (pq02 — the production
      // path, the q26_ivf_loaded / ir04 discipline): the fit is
      // amortized into the fixture; the query reads ONLY the N·m code
      // table + m·k centroid rows, builds the probe's ADC lookup
      // table, and reduces — the raw embedding column is never
      // touched at query time. The oracle is pq01's full
      // recomputation: hash equality proves the persisted index IS
      // the derivation.
      "pq02_pq_indexed",
      Some("""WITH v AS (SELECT vec_id AS id,
        |    CAST((i - 1) // 16 AS INTEGER) AS sub, CAST((i - 1) % 16 AS INTEGER) AS j,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
        |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
        |c0 AS (SELECT v.sub, init.cl, v.j, v.x AS c FROM v JOIN init USING (id)),
        |a1 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.sub, s1.cl, v.j, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 ON s1.id = v.id AND s1.sub = v.sub GROUP BY 1, 2, 3),
        |c1 AS (SELECT c0.sub, c0.cl, c0.j, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.sub = c0.sub AND c1u.cl = c0.cl AND c1u.j = c0.j),
        |a2 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s2 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |pt AS (SELECT c1.sub, c1.cl, CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS pdist
        |  FROM c1 JOIN (SELECT sub, j, x FROM v WHERE id = 0) p
        |    ON p.sub = c1.sub AND p.j = c1.j
        |  GROUP BY 1, 2),
        |adc AS (SELECT s2.id AS vec_id, CAST(SUM(pt.pdist) AS BIGINT) AS dist_u
        |  FROM s2 JOIN pt ON pt.sub = s2.sub AND pt.cl = s2.cl
        |  WHERE s2.id <> 0 GROUP BY 1)
        |SELECT vec_id, dist_u FROM adc ORDER BY dist_u, vec_id LIMIT 10""".stripMargin),
      (s, d) => graft.operators.ProductQuantizer.adcTopKIndexed(
          t(s, d).embeddings.filter(col("vec_id") === 0L)
            .select("vec_id", "embedding"),
          pqIndexLoaded(s, d), topK = 10)),

    GraftQuery(
      // IVF-PQ (pq03, ProductQuantizer.ivfPqTopK — Jégou et al.'s
      // IVFADC, the standard billion-scale ANN stack): km01's coarse
      // integer k-means partitions the corpus into lists; the product
      // quantizer trains on the RESIDUALS (integer differences of
      // micro-units — determinism survives the composition); the
      // probe visits its 2 nearest of 4 lists and scores candidates
      // by ADC with a PER-LIST lookup table. Search cost =
      // nProbe/kCoarse of the code table + m lookups per candidate.
      // The oracle recomputes the whole stack: coarse Lloyd (2
      // iterations), residuals, residual codebooks (1 iteration),
      // list probing, per-list tables, candidate sums.
      "pq03_ivfpq",
      Some(IvfPqOracle),
      (s, d) => graft.operators.ProductQuantizer.ivfPqTopK(
          t(s, d).embeddings, probeId = 0L, topK = 10, d = 64, m = 4,
          kCoarse = 4, coarseIterations = 2, kPq = 4, pqIterations = 1,
          nProbe = 2)),

    GraftQuery(
      // IVF-PQ search against the PERSISTED index (pq06 — r17
      // directive #1, closing the last O(corpus)-per-query path in the
      // ANN family): saveIvfPqIndex persists the coarse centroids, the
      // residual codebooks, and the code table PARTITIONED BY coarse
      // list; ivfPqTopKIndexed ranks the probe's 2 nearest of 4 lists
      // over the kCoarse-row coarse table and reads ONLY those list
      // partitions of the codes (parquet partition pruning — the
      // IvfIndex discipline), scoring by per-list broadcast ADC
      // tables. The oracle is pq03's full recomputation VERBATIM
      // (shared SQL text): hash equality proves the persisted index IS
      // the inline derivation (the pq02-vs-pq01 proof pattern).
      "pq06_ivfpq_indexed",
      Some(IvfPqOracle),
      (s, d) => graft.operators.ProductQuantizer.ivfPqTopKIndexed(
          t(s, d).embeddings.filter(col("vec_id") === 0L)
            .select("vec_id", "embedding"),
          ivfPqIndexLoaded(s, d), topK = 10, nProbe = 2)),

    GraftQuery(
      // BATCHED IVF-PQ search (pq08, ProductQuantizer
      // .ivfPqTopKIndexedBatch — pq04's production retrieval shape
      // with list pruning): N probes scored in ONE pass over the UNION
      // of their probed list partitions — per-probe list ranking is
      // one job over coarse × batch, the code scan carries the probed
      // union as literal partition filters, each code row joins only
      // its own probes' per-(probe, list) broadcast ADC tables, and
      // the per-probe top-k is a probe-keyed window. The oracle is
      // pq03's stack with per-probe list ranking, per-(probe, list)
      // tables, and a PARTITION BY probe_id ranking.
      "pq08_ivfpq_batched",
      Some(IvfPqBatchOracle),
      (s, d) => graft.operators.ProductQuantizer.ivfPqTopKIndexedBatch(
          t(s, d).embeddings.filter(col("vec_id").isin(0L, 1L, 2L))
            .select("vec_id", "embedding"),
          ivfPqIndexLoaded(s, d), topK = 10, nProbe = 2)
        .orderBy("probe_id", "rk")),

    GraftQuery(
      // ANN search ON INGEST (st21 — r19 directive #5, StreamReplay
      // .annSearchReplay): retrieval's production shape — a stream of
      // probe vectors answered top-k per probe against the PERSISTED
      // IVF-PQ index, which never leaves disk. Each micro-batch runs
      // the pq08 batched searcher inside foreachBatch (the micro-batch
      // IS the bounded probe set maxProbes caps), carrying its whole
      // scale shape per batch: broadcast coarse list ranking, LITERAL
      // partition filters for the probed-list union on the codes scan,
      // per-(probe, list) broadcast ADC tables, probe-keyed top-k.
      // Per-probe independence makes the union chunking-invariant, so
      // pq08's oracle gates st21 VERBATIM.
      "st21_stream_ann_search",
      Some(IvfPqBatchOracle),
      (s, d) => graft.streaming.StreamReplay.annSearchReplay(
          s, t(s, d).embeddings.filter(col("vec_id").isin(0L, 1L, 2L))
            .select("vec_id", "embedding"),
          ivfPqIndexLoaded(s, d), topK = 10, nProbe = 2, nChunks = 3)),

    GraftQuery(
      // IVF-PQ index APPEND lifecycle (pq07, ProductQuantizer
      // .appendToIvfPqIndex — the pq05 discipline lifted to the
      // list-partitioned index): coarse lists + residual codebooks
      // are fitted ONCE on the historical slice (vec_id % 10 != 0);
      // the nightly slice is coarse-assigned and residual-encoded
      // against those PERSISTED tables (two broadcast-tiny joins — the
      // corpus codes are never read, never re-fit) and appended into
      // its list partitions; a probed search then covers the union.
      // The oracle recomputes the whole lifecycle: historical coarse
      // Lloyd (2 iters) + residual codebooks (1 iter), batch argmin
      // assignments against the persisted geometry, 2-of-4 list
      // probing, ADC over the UNION of code sets, probe id 0 (itself
      // an appended vector) excluded.
      "pq07_ivfpq_append",
      Some("""WITH v AS (SELECT vec_id AS id, i,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 <> 0),
        |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
        |c0 AS (SELECT init.cl, v.i, v.x AS c FROM v JOIN init USING (id)),
        |a1 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
        |s1 AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.cl, v.i, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 USING (id) GROUP BY 1, 2),
        |c1 AS (SELECT c0.cl, c0.i, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.cl = c0.cl AND c1u.i = c0.i),
        |a2 AS (SELECT v.id, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.i = v.i GROUP BY 1, 2),
        |s2 AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |rv AS (SELECT v.id, CAST((v.i - 1) // 16 AS INTEGER) AS sub,
        |    CAST((v.i - 1) % 16 AS INTEGER) AS j, v.x - c1.c AS x
        |  FROM v JOIN s2 ON s2.id = v.id JOIN c1 ON c1.cl = s2.cl AND c1.i = v.i),
        |rinit AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM rv ORDER BY id LIMIT 4)),
        |rc0 AS (SELECT rv.sub, rinit.cl, rv.j, rv.x AS c FROM rv JOIN rinit USING (id)),
        |ra1 AS (SELECT rv.id, rv.sub, c.cl, CAST(SUM((rv.x - c.c) * (rv.x - c.c)) AS BIGINT) AS dist
        |  FROM rv JOIN rc0 c ON c.sub = rv.sub AND c.j = rv.j GROUP BY 1, 2, 3),
        |rs1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM ra1) WHERE rn = 1),
        |vb AS (SELECT vec_id AS id, i,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i) WHERE vec_id % 10 = 0),
        |ab AS (SELECT vb.id, c.cl, CAST(SUM((vb.x - c.c) * (vb.x - c.c)) AS BIGINT) AS dist
        |  FROM vb JOIN c1 c ON c.i = vb.i GROUP BY 1, 2),
        |sb AS (SELECT id, cl FROM (SELECT id, cl,
        |    row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn FROM ab) WHERE rn = 1),
        |rvb AS (SELECT vb.id, CAST((vb.i - 1) // 16 AS INTEGER) AS sub,
        |    CAST((vb.i - 1) % 16 AS INTEGER) AS j, vb.x - c1.c AS x
        |  FROM vb JOIN sb ON sb.id = vb.id JOIN c1 ON c1.cl = sb.cl AND c1.i = vb.i),
        |rab AS (SELECT rvb.id, rvb.sub, c.cl, CAST(SUM((rvb.x - c.c) * (rvb.x - c.c)) AS BIGINT) AS dist
        |  FROM rvb JOIN rc0 c ON c.sub = rvb.sub AND c.j = rvb.j GROUP BY 1, 2, 3),
        |rsb AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM rab) WHERE rn = 1),
        |assign_all AS (SELECT id, cl FROM s2 UNION ALL SELECT id, cl FROM sb),
        |codes_all AS (SELECT id, sub, cl FROM rs1 UNION ALL SELECT id, sub, cl FROM rsb),
        |pl AS (SELECT cl AS cc FROM (SELECT c1.cl, CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS cdist
        |    FROM c1 JOIN (SELECT i, x FROM vb WHERE id = 0) p ON p.i = c1.i GROUP BY 1)
        |  ORDER BY cdist, cl LIMIT 2),
        |prx AS (SELECT c1.cl AS cc, CAST((c1.i - 1) // 16 AS INTEGER) AS sub,
        |    CAST((c1.i - 1) % 16 AS INTEGER) AS j, p.x - c1.c AS rx
        |  FROM c1 JOIN pl ON pl.cc = c1.cl
        |  JOIN (SELECT i, x FROM vb WHERE id = 0) p ON p.i = c1.i),
        |tbl AS (SELECT prx.cc, rc0.sub, rc0.cl, CAST(SUM((prx.rx - rc0.c) * (prx.rx - rc0.c)) AS BIGINT) AS pdist
        |  FROM prx JOIN rc0 ON rc0.sub = prx.sub AND rc0.j = prx.j GROUP BY 1, 2, 3),
        |cand AS (SELECT codes_all.id, assign_all.cl AS cc, codes_all.sub, codes_all.cl
        |  FROM codes_all JOIN assign_all ON assign_all.id = codes_all.id
        |  WHERE assign_all.cl IN (SELECT cc FROM pl) AND codes_all.id <> 0),
        |adc AS (SELECT cand.id AS vec_id, CAST(SUM(tbl.pdist) AS BIGINT) AS dist_u
        |  FROM cand JOIN tbl ON tbl.cc = cand.cc AND tbl.sub = cand.sub AND tbl.cl = cand.cl
        |  GROUP BY 1)
        |SELECT vec_id, dist_u FROM adc ORDER BY dist_u, vec_id LIMIT 10""".stripMargin),
      (s, d) => graft.operators.ProductQuantizer.ivfPqTopKIndexed(
          t(s, d).embeddings.filter(col("vec_id") === 0L)
            .select("vec_id", "embedding"),
          ivfPqIndexIncremental(s, d), topK = 10, nProbe = 2)),

    GraftQuery(
      // BATCHED indexed ADC search (pq04, ProductQuantizer
      // .adcTopKIndexedBatch — r16 directive #4): production retrieval
      // scores N probes per pass, not one — the code table is scanned
      // ONCE, each code row joining its P broadcast lookup-table rows,
      // and the per-probe top-k is a probe-keyed window over the
      // (probe, id)-keyed sums. No per-probe driver loop, no per-probe
      // re-scan: per-probe cost amortizes the scan. The oracle is
      // pq01's Lloyd unroll with a per-probe ADC table and a
      // PARTITION BY probe_id ranking.
      "pq04_pq_batched",
      Some("""WITH v AS (SELECT vec_id AS id,
        |    CAST((i - 1) // 16 AS INTEGER) AS sub, CAST((i - 1) % 16 AS INTEGER) AS j,
        |    CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, 65)) AS r(i)),
        |init AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cl
        |  FROM (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4)),
        |c0 AS (SELECT v.sub, init.cl, v.j, v.x AS c FROM v JOIN init USING (id)),
        |a1 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s1 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a1) WHERE rn = 1),
        |c1u AS (SELECT s1.sub, s1.cl, v.j, CAST(SUM(v.x) AS BIGINT) // COUNT(*) AS c
        |  FROM v JOIN s1 ON s1.id = v.id AND s1.sub = v.sub GROUP BY 1, 2, 3),
        |c1 AS (SELECT c0.sub, c0.cl, c0.j, COALESCE(c1u.c, c0.c) AS c
        |  FROM c0 LEFT JOIN c1u ON c1u.sub = c0.sub AND c1u.cl = c0.cl AND c1u.j = c0.j),
        |a2 AS (SELECT v.id, v.sub, c.cl, CAST(SUM((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON c.sub = v.sub AND c.j = v.j GROUP BY 1, 2, 3),
        |s2 AS (SELECT id, sub, cl FROM (SELECT id, sub, cl,
        |    row_number() OVER (PARTITION BY id, sub ORDER BY dist, cl) AS rn FROM a2) WHERE rn = 1),
        |pt AS (SELECT p.pid AS probe_id, c1.sub, c1.cl,
        |    CAST(SUM((p.x - c1.c) * (p.x - c1.c)) AS BIGINT) AS pdist
        |  FROM c1 JOIN (SELECT id AS pid, sub, j, x FROM v WHERE id IN (0, 1, 2)) p
        |    ON p.sub = c1.sub AND p.j = c1.j
        |  GROUP BY 1, 2, 3),
        |adc AS (SELECT pt.probe_id, s2.id AS vec_id, CAST(SUM(pt.pdist) AS BIGINT) AS dist_u
        |  FROM s2 JOIN pt ON pt.sub = s2.sub AND pt.cl = s2.cl
        |  WHERE s2.id <> pt.probe_id GROUP BY 1, 2),
        |rk AS (SELECT probe_id, vec_id, dist_u,
        |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dist_u, vec_id) AS INTEGER) AS rk
        |  FROM adc)
        |SELECT probe_id, vec_id, dist_u, rk FROM rk WHERE rk <= 10
        |ORDER BY probe_id, rk""".stripMargin),
      (s, d) => graft.operators.ProductQuantizer.adcTopKIndexedBatch(
          t(s, d).embeddings.filter(col("vec_id").isin(0L, 1L, 2L))
            .select("vec_id", "embedding"),
          pqIndexLoaded(s, d), topK = 10)
        .orderBy("probe_id", "rk")),

    GraftQuery(
      // PQ index APPEND lifecycle (pq05, ProductQuantizer
      // .appendToPqIndex — r16 directive #6): the codebooks are fitted
      // ONCE on the historical slice (vec_id % 10 != 0); the nightly
      // slice is encoded against those PERSISTED codebooks (broadcast
      // m·k·(d/m) centroid rows — the corpus codes are never read,
      // never re-fit) and parquet-appended; a search then covers the
      // union. The oracle recomputes the whole lifecycle: historical
      // Lloyd (2 iterations, init = 4 smallest historical ids), batch
      // argmin against the persisted (after-one-update) centroids,
      // ADC over the UNION of code sets, probe id 0 (itself an
      // appended vector) excluded.
      "pq05_pq_append",
      Some(PqAppendOracle),
      (s, d) => graft.operators.ProductQuantizer.adcTopKIndexed(
          t(s, d).embeddings.filter(col("vec_id") === 0L)
            .select("vec_id", "embedding"),
          pqIndexIncremental(s, d), topK = 10)),

    GraftQuery(
      // Persisted-index COMPACTION under the witness (ix01,
      // ProductQuantizer.compactPqIndex — r18 directive #2): every
      // nightly append parquet-appends a batch-sized file set, so
      // after N nights probe latency pays N footer opens; the
      // maintenance pass rewrites the code table into ~target-sized
      // files, then re-fingerprints and re-blesses the meta atomically
      // — a stale index REFUSES compaction (never rewritten into
      // "clean" files), and an interrupted compaction leaves the loud
      // witness-stale state. Compaction is pure LAYOUT maintenance:
      // this entry searches an index built with three nightly appends
      // and then compacted (fixture asserts files actually collapsed),
      // gated by pq05's oracle text VERBATIM — hash-identical answers
      // from the maintained layout. The per-family sweep (IVF-PQ lists,
      // inverted-index term buckets, semantic clusters) is gated in
      // IndexCompactionSpec; band indexes are save-once bucketed
      // tables with no append lifecycle — nothing to compact there.
      "ix01_index_compaction",
      Some(PqAppendOracle),
      (s, d) => graft.operators.ProductQuantizer.adcTopKIndexed(
          t(s, d).embeddings.filter(col("vec_id") === 0L)
            .select("vec_id", "embedding"),
          pqIndexCompacted(s, d), topK = 10)),

    GraftQuery(
      // 2-D skyline / Pareto frontier (operators/Skyline): parts that
      // are cheapest for their size class — no other part is both no
      // pricier and no smaller with one strict. The oracle runs the
      // textbook quadratic NOT-EXISTS dominance self-join; the Spark
      // plan is the scale form: groupBy(min)→max collapse, two-phase
      // distributed prefix max (GlobalRank.withGlobalCumMax — no
      // single-partition window), one join back. Price quantized to
      // cents (NOTES invariant 1).
      "sk01_skyline",
      Some("""WITH p AS (SELECT p_partkey, p_brand,
        |    CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents, p_size
        |  FROM part)
        |SELECT p_partkey, p_brand, price_cents, p_size FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE (q.price_cents < p.price_cents AND q.p_size >= p.p_size)
        |     OR (q.price_cents = p.price_cents AND q.p_size > p.p_size))
        |ORDER BY price_cents, p_partkey""".stripMargin),
      (s, d) => {
        val p = t(s, d).part.select(col("p_partkey"), col("p_brand"),
          floor(col("p_retailprice") * 100 + 0.5).cast("long").as("price_cents"),
          col("p_size"))
        graft.operators.Skyline.skyline2d(p, "price_cents", "p_size")
          .select("p_partkey", "p_brand", "price_cents", "p_size")
          .orderBy("price_cents", "p_partkey")
      }),

    GraftQuery(
      // Sweep-line interval concurrency (operators/Intervals): peak
      // simultaneously-open intervals per event_type, intervals being
      // [ts, ts + (60 + floor(value)) s) — the capacity question over
      // an event log. Boundary deltas are pre-aggregated per instant
      // (map-side combine bounds the window input by distinct instants,
      // not event volume) and the +1/−1 netting at equal instants IS
      // the half-open semantics, so no sort tiebreak exists to get
      // wrong. peak_at = earliest peak instant, epoch micros.
      "iv01_max_concurrency",
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS s,
        |    epoch_us(ts) + (60 + CAST(FLOOR(value) AS BIGINT)) * 1000000 AS e
        |  FROM events),
        |b AS (SELECT event_type, s AS t, 1 AS d FROM e
        |  UNION ALL SELECT event_type, e AS t, -1 AS d FROM e),
        |c AS (SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS d FROM b GROUP BY 1, 2),
        |r AS (SELECT event_type, t,
        |    SUM(d) OVER (PARTITION BY event_type ORDER BY t) AS run FROM c),
        |p AS (SELECT event_type, CAST(MAX(run) AS BIGINT) AS peak FROM r GROUP BY 1)
        |SELECT r.event_type, p.peak, MIN(r.t) AS peak_at
        |FROM r JOIN p ON r.event_type = p.event_type AND r.run = p.peak
        |GROUP BY 1, 2 ORDER BY r.event_type""".stripMargin),
      (s, d) => {
        val iv = t(s, d).events.select(col("event_type"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            (lit(60L) + floor(col("value")).cast("long")) * 1000000L).as("e_us"))
        graft.operators.Intervals.maxConcurrency(iv, "event_type", "s_us", "e_us")
          .orderBy("event_type")
      }),

    GraftQuery(
      // Multi-source bounded-hop BFS (operators/ShortestPath): hop
      // distance from nation-1 customers over the same symmetric
      // customer↔supplier trade graph as pg01 — "within k degrees"
      // reachability. Frontier rounds (join + distinct + anti join,
      // shrinking input) with exact integer hops; the oracle unrolls
      // the three frontiers with NOT IN over the visited prefix.
      "pg03_bfs_hops",
      Some("""WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM e0 UNION ALL SELECT s, c FROM e0),
        |d0 AS (SELECT DISTINCT c_custkey AS node FROM customer WHERE c_nationkey = 1),
        |f1 AS (SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0)),
        |f2 AS (SELECT DISTINCT e.dst AS node FROM e JOIN f1 ON e.src = f1.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM f1)),
        |f3 AS (SELECT DISTINCT e.dst AS node FROM e JOIN f2 ON e.src = f2.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM f1
        |                      UNION ALL SELECT node FROM f2))
        |SELECT node, CAST(0 AS BIGINT) AS hop FROM d0
        |UNION ALL SELECT node, 1 FROM f1
        |UNION ALL SELECT node, 2 FROM f2
        |UNION ALL SELECT node, 3 FROM f3
        |ORDER BY node""".stripMargin),
      (s, d) => {
        val li = t(s, d).lineitem.select(col("l_orderkey"), col("l_suppkey"))
        val e0 = li.join(t(s, d).orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), (col("l_suppkey") + 10000000L).as("s"))
          .distinct()
        val edges = e0.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(e0.select(col("s").as("src"), col("c").as("dst")))
        val sources = t(s, d).customer.filter(col("c_nationkey") === 1)
          .select(col("c_custkey").as("node"))
        graft.operators.ShortestPath.bfsHops(edges, sources, maxHops = 3)
          .orderBy("node")
      }),

    GraftQuery(
      // Deterministic negative sampling for contrastive training
      // (TrainingPipeline.negativeSample): 3 pseudo-random negatives
      // per anchor doc via bucket-blocked draws — corpus rows hash into
      // 8 buckets, each anchor draws from ONE domain-separated target
      // bucket, rank = md5(anchor|candidate) permutation. Per-anchor
      // work is |corpus|/buckets (the scale knob), never a cross join;
      // the oracle replays the identical md5 arithmetic.
      "nm01_negative_sample",
      Some("""WITH pool AS (SELECT doc_id AS neg_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 8 AS bk
        |  FROM documents),
        |a AS (SELECT doc_id AS anchor_id,
        |    CAST(('0x' || substring(md5('a|' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 8 AS bk
        |  FROM documents WHERE doc_id % 50 = 0),
        |c AS (SELECT anchor_id, neg_id,
        |    CAST(('0x' || substring(md5(CAST(anchor_id AS VARCHAR) || '|' || CAST(neg_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
        |  FROM a JOIN pool USING (bk) WHERE anchor_id <> neg_id),
        |r AS (SELECT anchor_id, neg_id, CAST(row_number() OVER (
        |    PARTITION BY anchor_id ORDER BY h, neg_id) AS INTEGER) AS neg_rank FROM c)
        |SELECT anchor_id, neg_id, neg_rank FROM r WHERE neg_rank <= 3
        |ORDER BY anchor_id, neg_rank""".stripMargin),
      (s, d) => {
        val docs = t(s, d).documents
        graft.operators.TrainingPipeline.negativeSample(
            docs, "doc_id", docs.filter(col("doc_id") % 50 === 0),
            k = 3, buckets = 8)
          .orderBy("anchor_id", "neg_rank")
      }),

    GraftQuery(
      // Daily time-weighted average (TimeSeries.timeWeightedAvgDaily):
      // step-function TWAP per (user, day) — each value holds until
      // the next event, weights are exact int64 µs×milli products, only
      // the final division is FP (round4). One keyed lead window + one
      // hash agg; zero-span days are NULL by definition.
      "ts06_time_weighted_avg",
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS tu,
        |    event_id, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vu
        |  FROM events),
        |seg AS (SELECT user_id, day, tu, vu,
        |    lead(tu) OVER (PARTITION BY user_id, day ORDER BY tu, event_id) AS nt
        |  FROM ev),
        |agg AS (SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN nt IS NOT NULL THEN vu * (nt - tu) END) AS BIGINT) AS num,
        |    MAX(tu) - MIN(tu) AS den
        |  FROM seg GROUP BY 1, 2)
        |SELECT user_id, day, n_events,
        |  CASE WHEN den > 0
        |    THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000) / 10000 + 0
        |  END AS twa_milli
        |FROM agg ORDER BY user_id, day""".stripMargin),
      (s, d) => graft.operators.TimeSeries.timeWeightedAvgDaily(
          t(s, d).events.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("vu")),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id", milliCol = "vu")
        .orderBy("user_id", "day")),

    GraftQuery(
      // Last-touch marketing attribution: each purchase credits the
      // most recent preceding non-purchase event of the same user
      // within a 7-day lookback, else the 'direct' bucket; revenue
      // (milli-units) rolls up per attributed touch type. Composes
      // AsOfJoin.backward (the single-shuffle union+window as-of) —
      // touches are first deduped per (user, instant) by max event_id
      // so the as-of pick is tie-free — against DuckDB's native
      // ASOF LEFT JOIN as the oracle.
      "at01_attribution",
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, ts, value FROM events),
        |conv AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS rev
        |  FROM ev WHERE event_type = 'purchase'),
        |t0 AS (SELECT user_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_type <> 'purchase'),
        |tch AS (SELECT user_id, ts AS touch_ts, event_type AS touch_type
        |  FROM t0 WHERE rn = 1),
        |j AS (SELECT c.user_id, c.ts, c.rev, t.touch_ts, t.touch_type
        |  FROM conv c ASOF LEFT JOIN tch t
        |    ON t.user_id = c.user_id AND t.touch_ts <= c.ts),
        |a AS (SELECT CASE WHEN touch_ts IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000 THEN touch_type
        |      ELSE 'direct' END AS attr_type, rev FROM j)
        |SELECT attr_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(rev) AS BIGINT) AS rev_milli
        |FROM a GROUP BY 1 ORDER BY attr_type""".stripMargin),
      (s, d) => {
        val ev = t(s, d).events.select("user_id", "event_id", "event_type", "ts", "value")
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("rev_milli"))
        val tw = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
        val touches = ev.filter(col("event_type") =!= "purchase")
          .withColumn("__rn", row_number().over(tw)).filter(col("__rn") === 1)
          .select(col("user_id"), col("ts").as("touch_ts"),
            col("event_type").as("touch_type"))
        graft.operators.AsOfJoin.backward(conv, touches,
            key = "user_id", leftTs = "ts", rightTs = "touch_ts",
            rightValCols = Seq("touch_type", "touch_ts"))
          .withColumn("attr_type",
            when(col("touch_ts").isNotNull &&
              (unix_micros(col("ts")) - unix_micros(col("touch_ts")) <=
                604800000000L), col("touch_type"))
            .otherwise(lit("direct")))
          .groupBy("attr_type")
          .agg(count(lit(1)).as("n_conversions"), sum("rev_milli").as("rev_milli"))
          .orderBy("attr_type")
      }),

    GraftQuery(
      // One-sided CUSUM drift peak per user (TimeSeries.cusumPeak):
      // change-point statistic via its prefix-sum closed form
      // S_i = P_i − min(0, running-min P) — two stock window functions
      // over exact int64s, no sequential fold; reference level is the
      // global integer mean broadcast as one row. alarmed flags peaks
      // ≥ 2e6 milli-units of accumulated upward drift.
      "cp01_cusum_drift",
      Some("""WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vu FROM events),
        |r AS (SELECT CAST(SUM(vu) // COUNT(*) AS BIGINT) AS ref_units FROM e),
        |p AS (SELECT user_id, ts, event_id, ref_units,
        |    CAST(SUM(vu - ref_units) OVER w AS BIGINT) AS pp
        |  FROM e CROSS JOIN r
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT user_id, ref_units,
        |    pp - LEAST(0, CAST(MIN(pp) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS sv
        |  FROM p)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MAX(ref_units) AS ref_units, CAST(MAX(sv) AS BIGINT) AS peak_cusum,
        |  CAST(MAX(sv) AS BIGINT) >= 2000000 AS alarmed
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => graft.operators.TimeSeries.cusumPeak(
          t(s, d).events.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000 + 0.5).cast("long").as("vu")),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id", unitsCol = "vu")
        .withColumn("alarmed", col("peak_cusum") >= 2000000L)
        .orderBy("user_id")),

    GraftQuery(
      // Exact cumulative distinct users per day
      // (TimeSeries.cumulativeDistinctDaily): the growth metric that a
      // naive count_distinct-over-running-window recomputes from
      // history per day. First-seen decomposition: cum distinct up to
      // day D == #users with first day <= D — a user-keyed min-agg,
      // a day-keyed count, and a running sum over the per-day series
      // (single-task window over calendar-day cardinality, bounded by
      // the time range at any SF).
      "cd01_cumulative_distinct",
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |nw AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1) GROUP BY 1),
        |ac AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM ev GROUP BY 1)
        |SELECT ac.day, n_events, n_active,
        |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY ac.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM ac LEFT JOIN nw ON ac.day = nw.day
        |ORDER BY ac.day""".stripMargin),
      (s, d) => graft.operators.TimeSeries.cumulativeDistinctDaily(
          t(s, d).events, userCol = "user_id", tsCol = "ts")
        .orderBy("day")),

    GraftQuery(
      // Exact distinct via roaring-style bitmaps
      // (Frequency.bitmapDistinct): partitions pre-fold keys into
      // ≤4 KB bitmaps per (group, 32768-key bucket) BEFORE the
      // shuffle, so distinct-counting dense int keys moves
      // groups×buckets bitmap rows instead of every (group, key)
      // pair — exact (bitmaps partition the key space), vs the
      // count_distinct oracle.
      "bm01_bitmap_distinct",
      Some("SELECT l_returnflag AS flag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT)" +
        " AS n_distinct FROM lineitem GROUP BY 1 ORDER BY flag"),
      (s, d) => graft.operators.Frequency.bitmapDistinct(
          t(s, d).lineitem.select(col("l_returnflag").as("flag"), col("l_partkey")),
          groupCols = Seq("flag"), keyCol = "l_partkey")
        .orderBy("flag")),

    GraftQuery(
      // Weighted shortest paths, bounded edge count
      // (ShortestPath.weightedHops): Bellman–Ford delta relaxation over
      // the pg01 trade graph with w = min lineitem quantity-cents per
      // link — candidate volume per round is bounded by |edges| (each
      // edge relaxes once per round), while the oracle's recursive-CTE
      // path ENUMERATION grows with degree^hops; that asymmetry is why
      // relaxation is the 100 TB shape. maxEdges=2 keeps the oracle's
      // walk table ~1M rows at sf0.01.
      "wd01_weighted_paths",
      Some("""WITH RECURSIVE
        |e0 AS (SELECT o_custkey AS c, l_suppkey + 10000000 AS s,
        |    CAST(MIN(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |e AS (SELECT c AS src, s AS dst, w FROM e0 UNION ALL SELECT s, c, w FROM e0),
        |srcs AS (SELECT DISTINCT c_custkey AS node FROM customer WHERE c_nationkey = 1),
        |walk(node, dist, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM srcs
        |  UNION ALL
        |  SELECT e.dst, walk.dist + e.w, walk.hops + 1
        |  FROM walk JOIN e ON e.src = walk.node WHERE walk.hops < 2)
        |SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val e0 = tb.lineitem
          .select(col("l_orderkey"), col("l_suppkey"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("qc"))
          .join(tb.orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + 10000000L).as("s"))
          .agg(min("qc").as("w"))
        val edges = e0.select(col("c").as("src"), col("s").as("dst"), col("w"))
          .unionAll(e0.select(col("s").as("src"), col("c").as("dst"), col("w")))
        val sources = tb.customer.filter(col("c_nationkey") === 1)
          .select(col("c_custkey").as("node"))
        graft.operators.ShortestPath.weightedHops(edges, sources, maxEdges = 2)
          .orderBy("node")
      }),

    GraftQuery(
      // Vocabulary build + integer encoding (Vocabulary.build/encode):
      // the word-level text→tensor step. Build is a term-keyed agg
      // (bounded by observed vocabulary) + a k-row driver collect;
      // encode is shuffle-free — the k-entry vocab rides as a
      // broadcast map literal inside a higher-order transform, so the
      // 100 TB encode pass is pure map-side codegen. k=24 < |vocab|=31
      // so the OOV (id 0) path carries real traffic.
      "vb01_vocab_encode",
      Some("""WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ts FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS c
        |  FROM (SELECT unnest(ts) AS term FROM toks) GROUP BY 1),
        |vl AS (SELECT list(term ORDER BY c DESC, term) AS v
        |  FROM (SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 24)),
        |enc AS (SELECT doc_id,
        |    list_transform(ts, x -> COALESCE(list_position(v, x), 0)) AS ids
        |  FROM toks, vl)
        |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(ids, i -> i = 0)) AS BIGINT) AS n_oov,
        |  array_to_string(ids, ',') AS encoded
        |FROM enc ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val docs = t(s, d).documents
        val vocab = graft.operators.Vocabulary.build(docs, "text", k = 24)
        graft.operators.Vocabulary.encode(docs, "doc_id", "text", vocab)
          .orderBy("doc_id")
      }),

    GraftQuery(
      // Day-over-day trending ranks (TimeSeries.trendingRanks): rank
      // keys per day by activity, delta vs the previous active day.
      // One event-volume agg (map-side partial), then two PARTITIONED
      // windows over the days×keys aggregate — no global sort at any
      // SF.
      "tr01_trending_ranks",
      Some("""WITH pd AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT day, event_type, n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, event_type)
        |      AS BIGINT) AS rnk
        |  FROM pd)
        |SELECT day, event_type, n, rnk,
        |  LAG(rnk) OVER (PARTITION BY event_type ORDER BY day) AS prev_rnk,
        |  LAG(rnk) OVER (PARTITION BY event_type ORDER BY day) - rnk AS delta
        |FROM rk ORDER BY day, event_type""".stripMargin),
      (s, d) => graft.operators.TimeSeries.trendingRanks(
          t(s, d).events, keyCol = "event_type", tsCol = "ts")
        .orderBy("day", "event_type")),

    GraftQuery(
      // Pairwise correlation matrix (Profile.correlationMatrix): all 6
      // pairs over 4 lineitem measures in ONE aggregate pass —
      // constant-size moment buffers, single scan at any SF — then a
      // stack unpivot. The oracle's 6 UNION branches are the
      // every-pair-its-own-scan shape this operator exists to avoid.
      "cr01_correlation_matrix",
      Some(Seq(
          ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
          ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
          ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
        .map { case (a, b) =>
          s"SELECT '$a' AS col_x, '$b' AS col_y, " +
            s"ROUND(CORR($a, $b) * 10000) / 10000 + 0 AS c FROM lineitem" }
        .mkString("", " UNION ALL ", " ORDER BY col_x, col_y")),
      (s, d) => graft.operators.Profile.correlationMatrix(
          t(s, d).lineitem,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_x", "col_y")),

    GraftQuery(
      // Robust outliers via median/MAD (Profile.madOutliers) on exact
      // integer cents: percentile buffers bounded by the value DOMAIN
      // (price grid), interpolation lands on exact binary halves → no
      // rounding step anywhere. k=1.5 flags ~25 % of a uniform
      // distribution, so every group carries a real outlier count.
      "rs01_mad_outliers",
      Some("""WITH base AS (SELECT l_returnflag AS flag,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents FROM lineitem),
        |med AS (SELECT flag, CAST(median(cents) AS DOUBLE) AS med FROM base GROUP BY 1),
        |ad AS (SELECT b.flag, ABS(b.cents - m.med) AS ad, m.med
        |  FROM base b JOIN med m USING (flag)),
        |mad AS (SELECT flag, CAST(median(ad) AS DOUBLE) AS mad FROM ad GROUP BY 1)
        |SELECT a.flag, a.med, d.mad,
        |  CAST(SUM(CASE WHEN a.ad > 1.5 * d.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM ad a JOIN mad d USING (flag) GROUP BY 1, 2, 3 ORDER BY flag""".stripMargin),
      (s, d) => graft.operators.Profile.madOutliers(
          t(s, d).lineitem.select(col("l_returnflag").as("flag"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents")),
          groupCol = "flag", valueCol = "cents", k = 1.5)
        .orderBy("flag")),

    GraftQuery(
      // Association rules over fp01's frequent pairs
      // (Baskets.associationRules): confidence and lift for both
      // directions of every surviving pair. Apriori pruning bounds the
      // pair stage; scoring adds two item-keyed joins (AQE broadcasts
      // the item-support side) and a 1-row basket total riding as a
      // literal. Ratios are single IEEE divisions over exact counts,
      // 6-dp fixed (the tc01 gcc discipline).
      "ar01_association_rules",
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM b),
        |s AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n_item FROM b GROUP BY 1),
        |k AS (SELECT bk, it FROM b WHERE it IN (SELECT it FROM s WHERE n_item >= 2)),
        |p AS (SELECT a.it AS ia, c.it AS ib, CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM k a JOIN k c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |r AS (SELECT ia AS antecedent, ib AS consequent, n_pair FROM p
        |  UNION ALL SELECT ib, ia, n_pair FROM p)
        |SELECT r.antecedent, r.consequent, r.n_pair,
        |  sa.n_item AS n_ant, sc.n_item AS n_cons,
        |  ROUND(CAST(r.n_pair AS DOUBLE) / CAST(sa.n_item AS DOUBLE) * 1000000)
        |    / 1000000 + 0 AS confidence,
        |  ROUND(CAST(r.n_pair * nb.n AS DOUBLE)
        |    / CAST(sa.n_item * sc.n_item AS DOUBLE) * 1000000) / 1000000 + 0 AS lift
        |FROM r JOIN s sa ON sa.it = r.antecedent
        |  JOIN s sc ON sc.it = r.consequent, nb
        |ORDER BY antecedent, consequent""".stripMargin),
      (s, d) => graft.operators.Baskets.associationRules(
          t(s, d).lineitem.select(col("l_orderkey").as("basket_id"),
            col("l_partkey").as("item")),
          minSupport = 2)
        .orderBy("antecedent", "consequent")),

    GraftQuery(
      // Decision-stump split table (DecisionStump.splitTable): the
      // histogram-based split finding of tree learners. ONE
      // feature-keyed agg reduces the corpus to |domain| rows (50
      // quantity values); prefix sums + the weighted-Gini cost are
      // windows over the bounded histogram (cd01 adjudication class).
      // cost is two IEEE divisions over exact counts — bit-identical
      // across engines, no rounding.
      "dt01_split_table",
      Some("""WITH base AS (SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS p FROM lineitem),
        |pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM base GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(np) AS BIGINT) AS pt FROM pv),
        |cum AS (SELECT v, CAST(SUM(n) OVER w AS BIGINT) AS nl,
        |    CAST(SUM(np) OVER w AS BIGINT) AS pl
        |  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT v AS threshold, nl AS n_left, pl AS pos_left,
        |  nt - nl AS n_right, pt - pl AS pos_right,
        |  CAST(pl * (nl - pl) AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST((pt - pl) * ((nt - nl) - (pt - pl)) AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS cost
        |FROM cum, tot WHERE nl < nt ORDER BY threshold""".stripMargin),
      (s, d) => graft.operators.DecisionStump.splitTable(
          t(s, d).lineitem.select(
            floor(col("l_quantity") + 0.5).cast("long").as("qty"),
            (col("l_returnflag") === "R").as("returned")),
          featureCol = "qty", labelCol = "returned")
        .orderBy("threshold")),

    GraftQuery(
      // Day-of-week seasonal index (TimeSeries.seasonalIndexDow):
      // ratio-to-overall-average decomposition on exact integer units.
      // One day-keyed agg carries the event volume; everything after
      // is |days|-bounded; the index is one IEEE division of exact
      // integers (no rounding step).
      "ts07_seasonal_index",
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u
        |  FROM events GROUP BY 1),
        |dw AS (SELECT CAST(isodow(day) AS BIGINT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(u) AS BIGINT) AS units
        |  FROM daily GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS dt, CAST(SUM(u) AS BIGINT) AS ut
        |  FROM daily)
        |SELECT dow, n_days, units,
        |  CAST(units * dt AS DOUBLE) / CAST(ut * n_days AS DOUBLE) AS seasonal_index
        |FROM dw, tot ORDER BY dow""".stripMargin),
      (s, d) => graft.operators.TimeSeries.seasonalIndexDow(
          t(s, d).events.withColumn("vu",
            floor(col("value") * 100 + 0.5).cast("long")),
          tsCol = "ts", unitsCol = "vu")
        .orderBy("dow")),

    GraftQuery(
      // Leakage-safe group split (TrainingPipeline.groupSplit): every
      // user's events land in ONE of train/val/test via an md5 bucket
      // of the group key — zero shuffles for the assignment (pure
      // map-side expression, no group table, no join); the only
      // shuffle here is the verification aggregate.
      "gs01_group_split",
      Some("""WITH lab AS (SELECT user_id,
        |  CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS BIGINT) % 100 < 80 THEN 'train'
        |    WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS BIGINT) % 100 < 90 THEN 'val'
        |    ELSE 'test' END AS split FROM events)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM lab GROUP BY 1 ORDER BY split""".stripMargin),
      (s, d) => graft.operators.TrainingPipeline.groupSplit(
          t(s, d).events, groupCol = "user_id", pctTrain = 80, pctVal = 10)
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("split")),

    GraftQuery(
      // Consecutive-day activity streaks (Sessions.activityStreaks):
      // gaps-and-islands via the day − row_number constant. One
      // user-keyed shuffle; per-user work bounded by ACTIVE DAYS
      // (calendar), not event volume — the day dedup runs first.
      "gi01_activity_streaks",
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
        |isl AS (SELECT u, day - CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY day)
        |    AS INTEGER) AS island FROM ud),
        |st AS (SELECT u, island, CAST(COUNT(*) AS BIGINT) AS len FROM isl GROUP BY 1, 2)
        |SELECT u AS user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak
        |FROM st GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => graft.operators.Sessions.activityStreaks(
          t(s, d).events, userCol = "user_id", tsCol = "ts")
        .orderBy("user_id")),

    GraftQuery(
      // Rolling active users (Sessions.rollingActive): DAU/WAU/
      // stickiness. Sliding-window distinct doesn't decompose, so the
      // exact scale form explodes user-DAYS (users × calendar — never
      // event volume) by the fixed window factor, semi-joins the
      // broadcast day spine, and runs one day-keyed distinct agg. The
      // oracle's BETWEEN join is the same semantics declared
      // relationally.
      "wa01_rolling_active",
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
        |spine AS (SELECT DISTINCT day FROM ud),
        |dau AS (SELECT day, CAST(COUNT(DISTINCT u) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |ro AS (SELECT s.day, CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS wau
        |  FROM spine s JOIN ud ON ud.day BETWEEN s.day - 6 AND s.day GROUP BY 1)
        |SELECT dau.day, dau.dau, ro.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(ro.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN ro ON dau.day = ro.day ORDER BY dau.day""".stripMargin),
      (s, d) => graft.operators.Sessions.rollingActive(
          t(s, d).events, userCol = "user_id", tsCol = "ts", windowDays = 7)
        .orderBy("day")),

    GraftQuery(
      // Chi-square independence cells (Experiments.chiSquareCells):
      // event type × ISO weekday contingency. One cell-keyed agg over
      // the data; marginals broadcast-join back; every per-cell value
      // is engine-deterministic (exact counts, mirrored IEEE division
      // chain) — the global χ² is the consumer's sum, kept out of the
      // hash-compared output because cross-cell FP accumulation is
      // order-dependent.
      "ht01_chisq_cells",
      Some("""WITH cells AS (SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS observed FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS rr FROM cells GROUP BY 1),
        |c AS (SELECT dow, CAST(SUM(observed) AS BIGINT) AS cc FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS nn FROM cells)
        |SELECT cells.event_type, cells.dow, cells.observed,
        |  CAST(rr * cc AS DOUBLE) / CAST(nn AS DOUBLE) AS expected,
        |  CAST(cells.observed * nn - rr * cc AS DOUBLE)
        |    * CAST(cells.observed * nn - rr * cc AS DOUBLE)
        |    / CAST(rr * cc AS DOUBLE) / CAST(nn AS DOUBLE) AS contrib
        |FROM cells JOIN r USING (event_type) JOIN c USING (dow), n
        |ORDER BY cells.event_type, cells.dow""".stripMargin),
      (s, d) => graft.operators.Experiments.chiSquareCells(
          t(s, d).events.select(col("event_type"),
            (weekday(to_date(col("ts"))) + 1).cast("long").as("dow")),
          rowCol = "event_type", colCol = "dow")
        .orderBy("event_type", "dow")),

    GraftQuery(
      // Third-order path mining (Sessions.pathTrigrams): consecutive
      // event-type triples per user. Both leads share ONE user-keyed
      // window; output bounded by |types|³ at any volume.
      "nx02_trigram_paths",
      Some("""WITH seq AS (SELECT event_type AS t1,
        |    LEAD(event_type, 1) OVER w AS t2, LEAD(event_type, 2) OVER w AS t3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n FROM seq
        |WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY t1, t2, t3""".stripMargin),
      (s, d) => graft.operators.Sessions.pathTrigrams(
          t(s, d).events, userCol = "user_id", tsCol = "ts",
          idCol = "event_id", typeCol = "event_type")
        .orderBy("t1", "t2", "t3")),

    GraftQuery(
      // k-anonymity audit (Quality.kAnonymityViolations): the
      // quasi-identifier cells with < k members over (nation, segment,
      // binned balance). ONE tuple-keyed hash agg + the k filter —
      // output bounded by violating cells, nothing collects.
      "pk01_k_anonymity",
      Some("""SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bin,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1, 2, 3 HAVING COUNT(*) < 3
        |ORDER BY c_nationkey, c_mktsegment, bal_bin""".stripMargin),
      (s, d) => graft.operators.Quality.kAnonymityViolations(
          t(s, d).customer.select(col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_bin")),
          quasiCols = Seq("c_nationkey", "c_mktsegment", "bal_bin"), k = 3)
        .orderBy("c_nationkey", "c_mktsegment", "bal_bin")),

    GraftQuery(
      // Exact phrase search (Retrieval.phraseSearch): consecutive-
      // position intersection, overlap-counting. Each phrase term's
      // position list is filtered before its (doc_id, pos) equi-join —
      // join volume tracks posting lists, never the corpus. The oracle
      // recounts per document with an index-shifted list scan (a
      // different formulation — agreement is algorithm-independent).
      "ir05_phrase_search",
      Some("""WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
        |  FROM documents),
        |m AS (SELECT doc_id, CAST(COALESCE(list_sum(list_transform(range(1, len(ts)),
        |    i -> CASE WHEN ts[i] = 'value' AND ts[i+1] = 'table' THEN 1 ELSE 0 END)), 0)
        |  AS BIGINT) AS n_matches FROM toks)
        |SELECT doc_id, n_matches FROM m WHERE n_matches > 0 ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Retrieval.phraseSearch(
          t(s, d).documents, phrase = Seq("value", "table"))
        .orderBy("doc_id")),

    GraftQuery(
      // Month-over-month growth (TimeSeries.monthOverMonth) on exact
      // order cents: one month-keyed agg carries the volume; the lag
      // window runs over the calendar-bounded month series; ratio is
      // one IEEE division of exact integers.
      "pop01_month_over_month",
      Some("""WITH m AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS units
        |  FROM orders GROUP BY 1)
        |SELECT CAST(month AS DATE) AS month, n, units,
        |  LAG(units) OVER (ORDER BY month) AS prev_units,
        |  units - LAG(units) OVER (ORDER BY month) AS delta,
        |  CAST(units AS DOUBLE) / CAST(LAG(units) OVER (ORDER BY month) AS DOUBLE)
        |    AS ratio
        |FROM m ORDER BY month""".stripMargin),
      (s, d) => graft.operators.TimeSeries.monthOverMonth(
          t(s, d).orders.select(col("o_orderdate").cast("date").as("d"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
          dateCol = "d", unitsCol = "cents")
        .orderBy("month")),

    GraftQuery(
      // Multinomial Naive Bayes text classifier (NaiveBayes
      // .trainAndClassify): Laplace-smoothed, every per-token log
      // floored to integer micro-nats BEFORE summation (ta07's
      // discipline) so scores are order-independent integer sums and
      // the argmax is bit-reproducible. Training = two token-keyed
      // aggs bounded by |V|·|classes|; scoring = tokens × |classes|
      // with a broadcast count-table join.
      "nb01_naive_bayes",
      Some("""WITH tok AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
        |  FROM documents),
        |ctc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |ct AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tok),
        |nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d FROM documents GROUP BY 1),
        |ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents),
        |langs AS (SELECT DISTINCT lang AS cls FROM documents),
        |occ AS (SELECT t.doc_id, l.cls, t.term FROM tok t CROSS JOIN langs l),
        |sc AS (SELECT o.doc_id, o.cls,
        |    CAST(SUM(CAST(FLOOR(LN((COALESCE(ctc.c, 0) + 1.0) / (ct.n + v.v))
        |      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM occ o JOIN ct ON ct.lang = o.cls
        |    LEFT JOIN ctc ON ctc.lang = o.cls AND ctc.term = o.term, v
        |  GROUP BY 1, 2),
        |tot AS (SELECT sc.doc_id, sc.cls,
        |    sc.s + CAST(FLOOR(LN(CAST(nd.d AS DOUBLE) / ndt.t) * 1000000 + 0.5)
        |      AS BIGINT) AS score
        |  FROM sc JOIN nd ON nd.lang = sc.cls, ndt),
        |best AS (SELECT doc_id, cls, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rk
        |  FROM tot)
        |SELECT b.doc_id, b.cls AS pred, b.score AS score_micro, d.lang AS actual,
        |  b.cls = d.lang AS correct
        |FROM best b JOIN documents d ON d.doc_id = b.doc_id
        |WHERE rk = 1 ORDER BY b.doc_id""".stripMargin),
      (s, d) => graft.operators.NaiveBayes.trainAndClassify(
          t(s, d).documents, textCol = "text", classCol = "lang")
        .orderBy("doc_id")),

    GraftQuery(
      // Linear multi-touch attribution (Attribution.linearTouch): the
      // equal-split companion to at01's last-touch — exact integer
      // milli-credits, remainder to the last touch, Σcredits = Σrev
      // exactly (spec-gated). ONE user-keyed left join + two
      // conversion-keyed windows.
      "at02_linear_attribution",
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, ts, value FROM events),
        |conv AS (SELECT user_id, event_id, ts,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS rev
        |  FROM ev WHERE event_type = 'purchase'),
        |t0 AS (SELECT user_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_type <> 'purchase'),
        |tch AS (SELECT user_id, ts AS touch_ts, event_type AS touch_type
        |  FROM t0 WHERE rn = 1),
        |j AS (SELECT c.user_id, c.event_id, c.rev, t.touch_ts, t.touch_type,
        |    CASE WHEN t.touch_ts IS NOT NULL AND t.touch_ts <= c.ts
        |      AND epoch_us(c.ts) - epoch_us(t.touch_ts) <= 604800000000
        |      THEN 1 ELSE 0 END AS iw
        |  FROM conv c LEFT JOIN tch t ON t.user_id = c.user_id),
        |w AS (SELECT *, SUM(iw) OVER (PARTITION BY user_id, event_id) AS n FROM j),
        |cr AS (SELECT touch_type AS attr_type,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_id
        |        ORDER BY touch_ts DESC) = 1
        |      THEN rev - (n - 1) * (rev // n) ELSE rev // n END AS credit
        |  FROM (SELECT * FROM w WHERE iw = 1)),
        |direct AS (SELECT 'direct' AS attr_type, ANY_VALUE(rev) AS credit
        |  FROM w WHERE n = 0 GROUP BY user_id, event_id),
        |a AS (SELECT * FROM cr UNION ALL SELECT * FROM direct)
        |SELECT attr_type, CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(credit) AS BIGINT) AS rev_milli
        |FROM a GROUP BY 1 ORDER BY attr_type""".stripMargin),
      (s, d) => {
        val ev = t(s, d).events
          .select("user_id", "event_id", "event_type", "ts", "value")
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 1000 + 0.5).cast("long").as("rev_milli"))
        val tw = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
        val touches = ev.filter(col("event_type") =!= "purchase")
          .withColumn("__rn", row_number().over(tw)).filter(col("__rn") === 1)
          .select(col("user_id"), col("ts").as("touch_ts"),
            col("event_type").as("touch_type"))
        graft.operators.Attribution
          .linearTouch(conv, touches, windowUs = 604800000000L)
          .orderBy("attr_type")
      }),

    GraftQuery(
      // Calendar dimension generator (TimeSeries.dateDimension): the
      // warehouse date spine from the fact table's own range — source
      // scan reduces to a 1-row min/max agg; spine bounded by the
      // date range at any volume.
      "cal01_date_dim",
      Some("""WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
        |    MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |s AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |    AS day FROM b)
        |SELECT day, CAST(EXTRACT(year FROM day) AS INTEGER) AS y,
        |  CAST(EXTRACT(month FROM day) AS INTEGER) AS m,
        |  CAST(EXTRACT(day FROM day) AS INTEGER) AS dom,
        |  CAST(isodow(day) AS INTEGER) AS dow,
        |  CAST(EXTRACT(quarter FROM day) AS INTEGER) AS q,
        |  CAST(dayofyear(day) AS INTEGER) AS doy,
        |  day = CAST(date_trunc('month', day) AS DATE) AS month_start,
        |  day = last_day(day) AS month_end,
        |  isodow(day) >= 6 AS weekend
        |FROM s ORDER BY day""".stripMargin),
      (s, d) => graft.operators.TimeSeries.dateDimension(
          t(s, d).orders.select(col("o_orderdate").cast("date").as("d")),
          dateCol = "d")
        .orderBy("day")),

    GraftQuery(
      // Item-item collaborative filtering (Baskets.itemNeighbors):
      // top-3 co-purchase neighbors by binary-cosine similarity.
      // IEEE sqrt is correctly rounded (unlike ln — no micro-floor
      // needed); Apriori pruning bounds the pair stage; top-k is a
      // per-item partitioned window.
      "rec01_item_neighbors",
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |s AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n_item FROM b GROUP BY 1),
        |k AS (SELECT bk, it FROM b WHERE it IN (SELECT it FROM s WHERE n_item >= 2)),
        |p AS (SELECT a.it AS ia, c.it AS ib, CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM k a JOIN k c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dxy AS (SELECT ia AS item, ib AS neighbor, n_pair FROM p
        |  UNION ALL SELECT ib, ia, n_pair FROM p),
        |sc AS (SELECT d.item, d.neighbor, d.n_pair,
        |    ROUND(CAST(d.n_pair AS DOUBLE) / sqrt(CAST(sa.n_item * sb.n_item AS DOUBLE))
        |      * 1000000) / 1000000 + 0 AS sim
        |  FROM dxy d JOIN s sa ON sa.it = d.item JOIN s sb ON sb.it = d.neighbor)
        |SELECT item, neighbor, n_pair, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY item ORDER BY sim DESC, neighbor)
        |    AS BIGINT) AS rk
        |FROM sc QUALIFY rk <= 3 ORDER BY item, rk""".stripMargin),
      (s, d) => graft.operators.Baskets.itemNeighbors(
          t(s, d).lineitem.select(col("l_orderkey").as("basket_id"),
            col("l_partkey").as("item")),
          minSupport = 2, k = 3)
        .orderBy("item", "rk")),

    GraftQuery(
      // Ridge regression (ml03, Regression.fitRidgeExactPerGroup):
      // ml02's exact decimal Cramer solve with λ=1e9 added to the
      // feature diagonal (intercept unregularized). Same
      // one-hash-agg shape; exactness carries over verbatim — the
      // oracle just shifts s11/s22 in the determinants.
      "ml03_ridge",
      Some("""WITH q AS (SELECT l_returnflag AS grp,
        |    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
        |    CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y FROM lineitem),
        |m AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
        |    CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(x1 * x1) AS HUGEINT) + 1000000000 AS s11,
        |    CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
        |    CAST(SUM(x2 * x2) AS HUGEINT) + 1000000000 AS s22,
        |    CAST(SUM(x1 * y) AS HUGEINT) AS s1y, CAST(SUM(x2 * y) AS HUGEINT) AS s2y
        |  FROM q GROUP BY 1),
        |d AS (SELECT grp, n,
        |    s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1) + s1 * (s12 * s2 - s22 * s1) AS det,
        |    s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy) + s1 * (s2y * s2 - s22 * sy) AS det1,
        |    s11 * (s2y * n - s2 * sy) - s1y * (s12 * n - s2 * s1) + s1 * (s12 * sy - s2y * s1) AS det2,
        |    s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1) + s1y * (s12 * s2 - s22 * s1) AS det0
        |  FROM m)
        |SELECT grp, CAST(n AS BIGINT) AS n,
        |  ROUND((CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta1,
        |  ROUND((CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta2,
        |  ROUND((CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE)) * 1000000) / 1000000 + 0 AS beta0
        |FROM d ORDER BY grp""".stripMargin),
      (s, d) => graft.operators.Regression.fitRidgeExactPerGroup(
          t(s, d).lineitem.select(col("l_returnflag").as("grp"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("x1"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y")),
          Seq("grp"), "x1", "x2", "y", lambda = 1000000000L)
        .orderBy("grp")),

    GraftQuery(
      // Seasonal-relative anomalies (TimeSeries.dayVsWeekdayMean):
      // each day vs its own weekday's mean — deseasonalized
      // thresholding (ts07's decomposition, applied). One day-keyed
      // agg; |days|-bounded marginals broadcast back.
      "ts08_seasonal_anomaly",
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS units
        |  FROM events GROUP BY 1),
        |d2 AS (SELECT day, units, CAST(isodow(day) AS BIGINT) AS dow FROM daily),
        |dw AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(units) AS BIGINT) AS ud FROM d2 GROUP BY 1)
        |SELECT d2.day, d2.dow, d2.units,
        |  CAST(d2.units * dw.nd AS DOUBLE) / CAST(dw.ud AS DOUBLE) AS ratio,
        |  (CAST(d2.units * dw.nd AS DOUBLE) / CAST(dw.ud AS DOUBLE) > 1.05
        |   OR CAST(d2.units * dw.nd AS DOUBLE) / CAST(dw.ud AS DOUBLE) < 0.95)
        |    AS anomalous
        |FROM d2 JOIN dw USING (dow) ORDER BY d2.day""".stripMargin),
      (s, d) => graft.operators.TimeSeries.dayVsWeekdayMean(
          t(s, d).events.withColumn("vu",
            floor(col("value") * 100 + 0.5).cast("long")),
          tsCol = "ts", unitsCol = "vu", hi = 1.05, lo = 0.95)
        .orderBy("day")),

    GraftQuery(
      // arg_max/arg_min per group (q58): min_by/max_by with a
      // DETERMINISTIC composite ranking key (cents·1e7 + custkey —
      // exact integer, tie-free) so both engines pick the same row
      // under balance ties. One hash agg, no window, no join — the
      // cheapest "top row per group" plan Spark has.
      "q58_argmax",
      Some("""WITH c AS (SELECT c_nationkey, c_name,
        |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * 10000000 + c_custkey AS rk
        |  FROM customer)
        |SELECT c_nationkey, arg_max(c_name, rk) AS richest,
        |  CAST(MAX(cents) AS BIGINT) AS max_cents,
        |  arg_min(c_name, rk) AS poorest,
        |  CAST(MIN(cents) AS BIGINT) AS min_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val c = t(s, d).customer.select(col("c_nationkey"), col("c_name"),
          col("c_custkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
          .withColumn("rk", col("cents") * 10000000L + col("c_custkey"))
        c.groupBy("c_nationkey")
          .agg(max_by(col("c_name"), col("rk")).as("richest"),
            max("cents").as("max_cents"),
            min_by(col("c_name"), col("rk")).as("poorest"),
            min("cents").as("min_cents"))
          .orderBy("c_nationkey")
      })
  )
}
