package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineSim
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("cosineSim matches a hand-computed value") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12) // dot=1, |a|=|b|=sqrt(2)
  }

  test("cosineSim is 1 for identical vectors and 0 for zero vectors") {
    val df = Seq((Array(0.3f, -2.0f), Array(0.3f, -2.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b", "z")
    val r = df.select(cosineSim($"a", $"b"), cosineSim($"a", $"z"))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && r._2 === 0.0)
  }

  test("ivfInsert into a parquet-persisted index ≡ full rebuild, " +
      "probe for probe; the batch never re-assigns the index") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 16)
    val q = emb.filter($"vec_id" < 10)
    // nightly: build and PERSIST yesterday's index
    val dir = java.nio.file.Files
      .createTempDirectory("ivf-index").toString
    Similarity.ivfIndex(emb.filter($"vec_id" % 10 =!= 7), cents)
      .write.mode("overwrite").parquet(dir)
    // daily: read the stored index, insert today's batch, probe
    val updated = Similarity.ivfInsert(spark.read.parquet(dir),
      emb.filter($"vec_id" % 10 === 7), cents)
    val got = Similarity.ivfTopKIndexed(updated, q, cents, k = 3)
      .collect().map(_.toString).sorted.toSeq
    // the expensive alternative: rebuild the whole index
    val want = Similarity.ivfTopK(emb, q, cents, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want,
      "insert-then-probe must equal rebuild-then-probe row for row " +
        "(Voronoi assignment is per-vector)")
    // and the update's plan touches only the batch: the stored index
    // rows pass through unchanged (spot-check a stored row's cell)
    val storedCells = spark.read.parquet(dir)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val updatedCells = updated.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    storedCells.foreach { case (id, c) =>
      assert(updatedCells(id) === c, s"stored row $id was re-assigned")
    }
  }

  test("ivfPqInsert into a parquet-persisted compressed index ≡ full " +
      "rebuild; stored code rows never re-encode") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 16)
    val cb: Seq[Seq[Double]] = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val q = emb.filter($"vec_id" < 10)
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-index").toString
    Similarity.ivfPqIndex(emb.filter($"vec_id" % 10 =!= 7), cents, cb, 8)
      .write.mode("overwrite").parquet(dir)
    val updated = Similarity.ivfPqInsert(spark.read.parquet(dir),
      emb.filter($"vec_id" % 10 === 7), cents, cb, 8)
    val got = Similarity
      .ivfPqTopKIndexed(updated, q, cents, cb, 8, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val want = Similarity.ivfPqTopK(emb, q, cents, cb, 8, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want,
      "compressed insert-then-probe must equal rebuild-then-probe")
    // the stored (cell, codes) rows pass through byte-for-byte
    val stored = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    val after = updated.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    stored.foreach { case (id, cc) =>
      assert(after(id) === cc, s"stored row $id was re-encoded")
    }
  }

  test("PQ encode picks each codeword for itself; ADC reproduces quantization error") {
    import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
    val emb = Tables.embeddings(spark, sfDir)
    val cb: Seq[Seq[Double]] = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    // a codeword encodes to itself in every subspace (distance 0 beats
    // any distinct codeword; ties go to the lower code, and lower-id
    // duplicates would only lower the code, never change the distance)
    val selfCodes = emb.filter($"vec_id" < 16)
      .select($"vec_id", pqEncode($"embedding", cb, 8).as("codes"))
      .as[(Long, Array[Byte])].collect()
    selfCodes.foreach { case (vid, packed) =>
      val codes = packed.map(_ & 0xFF)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
      codes.zipWithIndex.foreach { case (c, m) =>
        val got = cb(c).slice(m * 8, m * 8 + 8)
        val self = cb(vid.toInt).slice(m * 8, m * 8 + 8)
        assert(got === self, s"vec $vid subspace $m must encode to its own subvector")
      }
    }
    // ADC distance of a vector against its own codes = total
    // quantization error; exact for codewords (zero), small for others
    val zero = emb.filter($"vec_id" < 16)
      .select(pqAdcDist($"embedding", pqEncode($"embedding", cb, 8), cb, 8))
      .as[Double].collect()
    zero.foreach(d => assert(math.abs(d) < 1e-9, s"codeword self-ADC must be ~0, got $d"))
  }

  test("PQ kernels reject non-float element types at ANALYSIS, not mid-job") {
    import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
    val cb: Seq[Seq[Double]] = Seq(Seq.fill(8)(0.0), Seq.fill(8)(1.0))
    val bad = Seq((1L, Array(1, 2, 3, 4, 5, 6, 7, 8))).toDF("id", "v")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(pqEncode($"v", cb, 8)).queryExecution.analyzed
    }
    assert(e1.getMessage.contains("array<float>"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(pqAdcDist($"v", lit(Array[Byte](0)), cb, 8)).queryExecution.analyzed
    }
    assert(e2.getMessage.contains("array<float>"), e2.getMessage)
    // binary codes are required on the ADC right side
    val fl = Seq((1L, Array.fill(8)(0.5f), "notbinary")).toDF("id", "v", "c")
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      fl.select(pqAdcDist($"v", $"c", cb, 8)).queryExecution.analyzed
    }
    assert(e3.getMessage.toLowerCase.contains("binary"), e3.getMessage)
  }

  test("ivfTopK with KMeansND-TRAINED cells recalls most exact neighbors") {
    // the production path: coarse cells fitted with Lloyd's, not the
    // deterministic first-k seed the oracle uses
    val emb = Tables.embeddings(spark, sfDir)
    val pts = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val trained = graft.operators.KMeansND.fit(pts, 8, maxIter = 5)
    val queries = emb.filter($"vec_id" < 10)
    val ivf = Similarity.ivfTopK(emb, queries, trained, k = 3, nprobe = 2)
      .select($"qid", $"vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.topK(emb, queries, k = 3)
      .select($"qid", $"vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.size === 10, "every query must produce results")
    val recall = exact.map { case (q, ex) =>
      ivf.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.2,
      s"trained-cell IVF recall@3 vs exact cosine was $recall — probing is broken")
  }

  test("multi-probe LSH recall@3 beats single-probe at the same plane " +
      "count — perturbation probes substitute for hash tables") {
    // the Lv et al. claim, MEASURED on the gate corpus: flipping the
    // two nearest hyperplanes must recover neighbors the single
    // bucket misses, at the same 6-plane signature
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.topK(emb, q, 3).select($"qid", $"vid")
      .as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"vid").as[(Long, Long)].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val single = recallOf(Similarity.lshTopK(emb, q, 3))
    val multi = recallOf(Similarity.lshMultiProbeTopK(emb, q, 3))
    info(s"lsh recall@3 single=$single multi=$multi")
    assert(multi >= single,
      s"multi-probe must never lose recall (single=$single multi=$multi)")
    assert(multi > single,
      s"on this corpus the flip probes must add recall " +
        s"(single=$single multi=$multi) — if equal, the probe set is dead")
  }

  test("nswTopK recall@3 meets the IVF+PQ nprobe=2 frontier point and the 0.8 floor") {
    // the ann_hnsw gate: the graph walk (efSearch=32 beam per shard)
    // must recall at least as well as the recall-sweep's IVF+PQ
    // nprobe=2 operating point at comparable per-query probe cost,
    // and clear the 0.8 absolute production floor
    import graft.operators.KMeansND
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.topK(emb, q, 3).select($"qid", $"vid")
      .as[(Long, Long)].collect().toSet
    val nsw = Similarity.nswTopK(emb, q, 3)
      .select($"qid", $"vid").as[(Long, Long)].collect().toSet
    val nswRecall = exact.intersect(nsw).size.toDouble / exact.size
    // the same IVF+PQ nprobe=2 configuration ann_recall_sweep gates
    val cents = KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 16)
    val cb: Seq[Seq[Double]] = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val ivfpq = Similarity.ivfPqTopK(emb, q, cents, cb, 8, k = 3, nprobe = 2)
      .select($"qid", $"vid").as[(Long, Long)].collect().toSet
    val ivfpqRecall = exact.intersect(ivfpq).size.toDouble / exact.size
    info(s"nsw recall@3=$nswRecall vs ivfpq nprobe=2 recall@3=$ivfpqRecall")
    assert(nswRecall >= ivfpqRecall,
      s"graph ANN recall $nswRecall must meet the IVF+PQ point $ivfpqRecall")
    assert(nswRecall >= 0.8, s"graph ANN recall $nswRecall below the 0.8 floor")
    // every query answers with a full top-3
    assert(nsw.groupBy(_._1).forall(_._2.size == 3))
  }

  test("nswTopK survives tiny and skewed partitions") {
    // 1-vector partitions, an empty-partition repartition, and a
    // corpus smaller than m must all still answer
    val tiny = (0L until 5L).map(i =>
      (i, Array.tabulate(4)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding").repartition(8)
    val out = Similarity.nswTopK(tiny, tiny.filter($"vec_id" === 0L), k = 2)
      .collect()
    assert(out.length === 2, s"expected a full top-2, got ${out.toSeq}")
    assert(out.forall(_.getAs[Long]("vid") !== 0L), "no self-match")
  }

  test("trained IVF cells: Lloyd descent beats the first-k seed on sf0.01") {
    // KMeansND.fit starts from the same first-k seed the oracle layout
    // uses, so Lloyd's monotone SSE descent GUARANTEES lower mean
    // coarse-quantization error — that is the asserted training metric.
    // Recall@3 at nprobe=2 is additionally floored, not compared to the
    // seeded layout: on these near-uniform synthetic vectors both
    // layouts are equally balanced (max cell 41 vs 42 of 500) and the
    // seeded-vs-trained recall delta is 3 neighbors out of 30 — noise,
    // not signal (real corpora with cluster structure are where trained
    // cells win recall; the error metric captures that ordering here).
    import graft.operators.KMeansND
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val pts = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val seeded = KMeansND.seed(pts, 16)
    val trained = Similarity.trainedCells(emb, 16)
    def qerr(c: Seq[(Int, Array[Double])]): Double =
      KMeansND.assign(pts, c).agg(avg("dist")).as[Double].head()
    val (es, et) = (qerr(seeded), qerr(trained))
    assert(et < es, s"trained mean cell distance $et must beat seeded $es")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.topK(emb, q, 3).select($"qid", $"vid")
      .as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, trained, 3, nprobe = 2)
      .select($"qid", $"vid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"trained-cell recall@3 was $recall")
  }

  test("trained PQ codebooks beat the first-k seed on error AND recall (sf0.01)") {
    import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
    import graft.operators.Similarity
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val cbSeed: Seq[Seq[Double]] = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cbTrained = Similarity.trainedPqCodebook(emb, 16, 8)
    // mean self-ADC = total quantization error of the code assignment
    def mse(cb: Seq[Seq[Double]]): Double = {
      val e = emb.select(pqAdcDist($"embedding",
        pqEncode($"embedding", cb, 8), cb, 8)).as[Double].collect()
      e.sum / e.length
    }
    // recall@3 of ADC ranking vs exact squared-L2 ground truth
    def recall(cb: Seq[Seq[Double]]): Double = {
      import org.apache.spark.sql.expressions.Window
      val codes = emb.select($"vec_id", pqEncode($"embedding", cb, 8).as("codes"))
      val q = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"))
      val top = codes.join(broadcast(q), $"qid" =!= $"vec_id")
        .select($"qid", $"vec_id".as("vid"),
          pqAdcDist($"qemb", $"codes", cb, 8).as("ad"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy($"ad", $"vid")))
        .filter($"rk" <= 3).select($"qid", $"vid").as[(Long, Long)].collect().toSet
      val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      val gt = all.filter(_._1 < 10).flatMap { case (qid, qv) =>
        all.filter(_._1 != qid).map { case (vid, v) =>
          (qid, vid, qv.zip(v).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
        }.sortBy(x => (x._3, x._2)).take(3).map(x => (x._1, x._2))
      }.toSet
      gt.intersect(top).size.toDouble / gt.size
    }
    val (ms, mt) = (mse(cbSeed), mse(cbTrained))
    assert(mt < ms, s"trained PQ quantization error $mt must beat seeded $ms")
    val (rs, rt) = (recall(cbSeed), recall(cbTrained))
    assert(rt >= rs, s"trained PQ recall@3 $rt must be >= seeded $rs")
  }

  test("production PQ recipe clears the recall floor: normalize + train + rerank") {
    // the recall-repair stack end to end, as a deployment runs it for
    // cosine ANN: L2-normalize BEFORE encoding (unit vectors make
    // ADC's squared-L2 monotone with cosine: |a-b|^2 = 2 - 2cos, so
    // the shortlist stops missing high-cosine/far-in-L2 vectors),
    // train per-subspace codebooks, ADC-shortlist from codes alone,
    // exact-cosine rerank of the shortlist only. Floors: recall@3
    // >= 0.8 at shortlist 32 on sf0.01, and widening the shortlist
    // never loses recall (supersets reranked exactly).
    import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
    import graft.functions.VectorFunctions.cosineSim
    import graft.functions.TopKAggregate.topk
    import graft.operators.Similarity
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val norm = emb.select($"vec_id",
      transform($"embedding", x =>
        (x / sqrt(aggregate($"embedding", lit(0.0d),
          (acc, v) => acc + v * v))).cast("float")).as("embedding"))
      .localCheckpoint(true) // train + encode + query share one materialization
    // 64 codewords per subspace (byte codes; production uses 256) —
    // the 16-code setting the SQL-gated queries use for oracle economy
    // is too coarse to clear a production floor, and code count is the
    // third knob of the same frontier
    val cb = Similarity.trainedPqCodebook(norm, 64, 8)
    val codes = norm.select($"vec_id", pqEncode($"embedding", cb, 8).as("codes"))
    val q = norm.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"))
    val truth = Similarity.topK(emb, emb.filter($"vec_id" < 10), k = 3)
      .select($"qid", $"vid").as[(Long, Long)].collect().toSet
    val adc = codes.join(broadcast(q), $"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("vid"),
        pqAdcDist($"qemb", $"codes", cb, 8).as("ad"))
    def rerankRecall(shortN: Int): Double = {
      val got = adc.groupBy("qid")
        .agg(topk(struct($"ad", $"vid".as("v")), shortN).as("top"))
        .select($"qid", explode($"top").as("t"))
        .select($"qid", $"t.v".as("vid"))
        .join(emb.select($"vec_id".as("vid"), $"embedding".as("vemb")), "vid")
        .join(broadcast(emb.filter($"vec_id" < 10)
          .select($"vec_id".as("qid"), $"embedding".as("qe"))), "qid")
        .select($"qid", $"vid", cosineSim($"qe", $"vemb").as("cos"))
        .groupBy("qid")
        .agg(topk(struct((-$"cos").as("negcos"), $"vid".as("v")), 3).as("top"))
        .select($"qid", explode($"top").as("t"))
        .select($"qid", $"t.v".as("vid")).as[(Long, Long)].collect().toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val (r10, r32) = (rerankRecall(10), rerankRecall(32))
    info(s"normalized+trained PQ rerank recall@3: shortlist10=$r10 shortlist32=$r32")
    assert(r32 >= r10, "a wider shortlist reranked exactly can never lose recall")
    assert(r32 >= 0.8,
      s"normalized+trained rerank@32 recall $r32 below the 0.8 production floor")
  }

  test("ivfPqTopK composes trained cells + trained codebooks (production path)") {
    // the oracle-gated ann_ivfpq keeps the first-k layout; this is the
    // trained composition a production index uses. Structural contract:
    // k dense ranks per query, ADC ascending within a query, no
    // self-hits, and every hit's ADC >= the true quantization floor 0.
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val cells = Similarity.trainedCells(emb, 16, maxIter = 3)
    val cb = Similarity.trainedPqCodebook(emb, 16, 8, maxIter = 2)
    val out = Similarity.ivfPqTopK(emb, emb.filter($"vec_id" < 5),
        cells, cb, numSub = 8, k = 3, nprobe = 2)
      .select($"qid", $"rk", $"vid", $"ad")
      .as[(Long, Int, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    for ((qid, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1, 2, 3), s"qid=$qid ranks")
      assert(sorted.forall(_._3 != qid), s"qid=$qid self-hit")
      val ads = sorted.map(_._4).toSeq
      assert(ads === ads.sorted, s"qid=$qid ADC not ascending: $ads")
      assert(ads.forall(_ >= 0.0), s"qid=$qid negative ADC distance")
    }
  }

  test("residual IVF-PQ: contiguous-cid contract and well-formed rankings") {
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 16)
    // residual codebook from the oracle-gated query's own construction
    val out = graft.queries.SimilarityPack.defs("ann_ivfpq_residual")(spark, d)
      .select($"qid", $"rk", $"vid", $"ad")
      .as[(Long, Int, Long, Double)].collect()
    for ((qid, rows) <- out.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1, 2, 3), s"qid=$qid ranks")
      assert(sorted.forall(_._3 != qid), s"qid=$qid self-hit")
      val ads = sorted.map(_._4).toSeq
      assert(ads === ads.sorted && ads.forall(_ >= 0.0), s"qid=$qid ADC $ads")
    }
    // non-contiguous cell ids must fail loudly, not mis-index centroids
    val gappy = cents.filterNot(_._1 == 3)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfPqResidualTopK(
        emb, emb.filter($"vec_id" < 2), gappy,
        Seq.fill(4)(Seq.fill(64)(0.0)), 8, 3)
    }
    assert(e.getMessage.contains("contiguous"))
  }

  test("a persisted IVF index prunes non-probed cells at the scan") {
    // the disk layout for IVF at scale: corpus written hive-partitioned
    // by cell id; probing nprobe cells becomes partition pruning — the
    // scan never opens the other cells' files
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    try {
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select($"vec_id".as("id"), $"embedding".as("vec")), 8)
      val cells = emb.withColumn("cell",
        graft.operators.KMeansND.nearest($"embedding", cents).getField("cid"))
      graft.sources.Sinks.writePartitioned(cells, s"$dir/ivf", "cell")
      val probed = spark.read.parquet(s"$dir/ivf").filter($"cell".isin(2, 5))
      val p = probed.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("PartitionFilters") && (p.contains("cell#") || p.contains("cell IN")),
        s"cell probe must prune partitions, plan was:\n$p")
      val all = cells.filter($"cell".isin(2, 5)).count()
      assert(probed.count() === all, "pruned read must return exactly the probed cells")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ann_pq ranks by true distance when vectors are exactly codewords") {
    // for corpus rows that ARE codewords, ADC degenerates to the exact
    // inter-codeword distance — the approximation is tight there
    val r = SparkEntry.queries("ann_pq")(spark, sfDir)
    assert(r.count() === 30) // 10 queries x top-3
    assert(r.filter($"ad" < 0).count() === 0, "squared distances are non-negative")
  }

  test("cosineSim survives codegen in a realistic plan") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(cosineSim($"a.embedding", $"b.embedding").as("c"))
      .filter($"c" > -2).count()
    assert(n > 0)
  }

  test("topK returns k ranked neighbors per query, self excluded") {
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.topK(emb, emb.filter($"vec_id" < 3), 5).collect()
    assert(r.length === 15)
    assert(r.forall(row => row.getAs[Long]("qid") != row.getAs[Long]("vid")))
    val ranks = r.groupBy(_.getAs[Long]("qid")).values.map(_.map(_.getAs[Int]("rk")).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3, 4, 5)))
  }

  test("lshTopK candidates are a subset of exact ranking universe") {
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.lshTopK(emb, emb.filter($"vec_id" < 5), 3)
    assert(r.count() <= 15)
  }

  test("ivfTopK with nprobe=all cells reproduces the exact topK") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 3)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 4)
    // probing every cell makes IVF exhaustive → must equal brute force
    val ivf = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.topK(emb, q, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf === exact)
  }

  test("ivfTopK with nprobe=1 searches only the query's own cell") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 3)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 4)
    val r = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 1)
    // bounded output, correctly ranked per query
    val rows = r.collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("incremental semDedup probes a cell-partitioned corpus with partition pruning") {
    // the ingest-time layout for semantic dedup at scale: the corpus is
    // persisted hive-partitioned by cell id (the IVF layout's twin); an
    // incoming batch assigns to cells, and the dup probe reads ONLY the
    // touched cells' files via partition pruning — never the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_").toString
    try {
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select($"vec_id".as("id"), $"embedding".as("vec")), 8)
      def cellOf(c: org.apache.spark.sql.Column) =
        graft.operators.KMeansND.nearest(c, cents).getField("cid")
      graft.sources.Sinks.writePartitioned(
        emb.withColumn("cell", cellOf($"embedding")), s"$dir/corpus", "cell")
      // incoming batch: an exact replica of corpus vec 42 plus a
      // novel vector (negated copy of vec 7 — anti-aligned to the
      // corpus, cosine <= 0 to its original)
      val batch = emb.filter($"vec_id" === 42L)
        .select(lit(100042L).as("vec_id"), $"embedding")
        .union(emb.filter($"vec_id" === 7L)
          .select(lit(100007L).as("vec_id"),
            transform($"embedding", x => -x).as("embedding")))
        .withColumn("cell", cellOf($"embedding"))
      val touched = batch.select("cell").distinct().as[Int].collect().toSeq
      val probed = spark.read.parquet(s"$dir/corpus")
        .filter($"cell".isin(touched: _*))
      val plan = probed.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(plan.contains("PartitionFilters"),
        s"cell probe must prune partitions, plan was:\n$plan")
      assert(probed.select("cell").distinct().as[Int].collect().toSet
        === touched.toSet, "probe must read exactly the touched cells")
      val dups = batch.as("b").join(probed.as("c"),
          $"b.cell" === $"c.cell" &&
            round(cosineSim($"b.embedding", $"c.embedding"), 4) >= 0.99)
        .select($"b.vec_id").distinct().as[Long].collect().toSet
      assert(dups.contains(100042L), "exact replica must be flagged as a dup")
      assert(!dups.contains(100007L), "novel anti-aligned vector must survive")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("semDedup with trained cells: funnel conserved, replicas drop exactly") {
    // the production variant of the oracle-gated embed_semdedup query:
    // cells from the distributed Lloyd's instead of the first-k seed
    val emb = Tables.embeddings(spark, sfDir)
    val cells = Similarity.trainedCells(emb, nCells = 8, maxIter = 5)
    def funnel(df: org.apache.spark.sql.DataFrame) =
      Similarity.semDedup(df, cells, tau = 0.3).collect()
        .map(r => r.getAs[Int]("cid") ->
          (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_dropped"))).toMap
    val n = emb.count()
    val f1 = funnel(emb)
    assert(f1.values.map(_._1).sum === n, "every vector lands in exactly one cell")
    f1.values.foreach { case (v, k, d) => assert(k + d === v, "kept+dropped=seen") }
    // replica robustness: doubling the corpus with offset ids must not
    // change the kept set — each replica shares its original's vector,
    // collapses into the same (cell, hash) group, and the lower-id
    // original stays the keeper. Exact funnel: n_vecs doubles, n_kept
    // is unchanged per cell, drops absorb the replicas.
    val doubled = emb.union(emb.withColumn("vec_id", col("vec_id") + 1000000L))
    val f2 = funnel(doubled)
    assert(f2.keySet === f1.keySet)
    for ((cid, (v1, k1, _)) <- f1) {
      val (v2, k2, d2) = f2(cid)
      assert(v2 === 2 * v1, s"cell $cid: replica members must double n_vecs")
      assert(k2 === k1, s"cell $cid: the kept set must be replica-invariant")
      assert(d2 === 2 * v1 - k1, s"cell $cid: drops must absorb all replicas")
    }
  }

  test("meanVectorDrift: identical halves read 1, orthogonal halves read 0") {
    // group 0: both halves hold the SAME two vectors → mean vectors
    // coincide → cosine exactly 1. group 1: half 0 lives on +x, half 1
    // on +y → mean vectors orthogonal → cosine exactly 0.
    def vx(a: Float, b: Float) = Array(a, b, 0f, 0f)
    val rows = Seq(
      (0, 0, vx(1f, 2f)), (0, 0, vx(3f, 1f)),
      (0, 1, vx(1f, 2f)), (0, 1, vx(3f, 1f)),
      (1, 0, vx(2f, 0f)), (1, 0, vx(4f, 0f)),
      (1, 1, Array(0f, 3f, 0f, 0f)), (1, 1, Array(0f, 5f, 0f, 0f)))
    val df = rows.toDF("label", "half", "embedding")
    val out = graft.operators.Similarity.meanVectorDrift(df, "label")
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Double]("cos_ref_cur"), r.getAs[Long]("n_dims"))).toMap
    assert(out(0) === ((1.0, 4L)), s"identical halves must read cos 1, got $out")
    assert(out(1) === ((0.0, 4L)), s"orthogonal halves must read cos 0, got $out")
  }

  test("ann_sq8: recall@3 vs exact L2 is near-perfect at 4x compression") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("ann_sq8")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact squared-L2 ground truth, driver-side
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var hit = 0; var total = 0
    got.keys.foreach { qid =>
      val truth = vecs.collect { case (vid, v) if vid != qid =>
        (l2(vecs(qid), v), vid)
      }.toSeq.sorted.take(3).map(_._2).toSet
      hit += got(qid).intersect(truth).size
      total += 3
    }
    assert(got.size > 0 && got.forall(_._2.size == 3))
    val recall = hit.toDouble / total
    assert(recall >= 0.9, s"SQ8 recall@3 degraded: $recall")
  }

  test("embed_drift joins every dimension and stays in cosine bounds") {
    // the synthetic embeddings are NOT clustered by label (per-label
    // means are noise around zero), so the table read only pins the
    // invariants: all 64 dims join per label, cosine within [-1, 1],
    // one row per label present in the table
    val rows = SparkEntry.queries("embed_drift")(spark, sfDir)
      .collect().map(r => (r.getAs[Int]("label"),
        r.getAs[Double]("cos_ref_cur"), r.getAs[Long]("n_dims")))
    assert(rows.nonEmpty)
    rows.foreach { case (l, cos, nd) =>
      assert(nd === 64L, s"label $l: every dimension must join, got $nd")
      assert(math.abs(cos) <= 1.0 + 1e-9, s"label $l: cosine out of bounds: $cos")
    }
  }

  test("dominantDirection recovers a planted principal axis") {
    // 20 vectors along e1 with ±3..±1 magnitudes plus a small e2
    // ripple: the top principal direction of the second-moment matrix
    // is ±e1 and carries nearly all the energy
    val vecs = (0 until 20).map { i =>
      val a = (1 + i % 3).toFloat * (if (i % 2 == 0) 1f else -1f)
      Array(a, 0.05f * (if (i % 4 < 2) 1f else -1f), 0.0f, 0.0f)
    }
    val df = vecs.toDF("embedding")
    val out = graft.operators.Similarity.dominantDirection(df, dims = 4)
      .collect().map(r => (r.getAs[Long]("dim"), r.getAs[Double]("v"),
        r.getAs[Double]("lambda"), r.getAs[Double]("share")))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    val v = out.map(_._2)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3,
      s"direction must align with e1, got ${v.toSeq}")
    assert(math.abs(v(2)) < 1e-3 && math.abs(v(3)) < 1e-3,
      s"zero dims must stay zero, got ${v.toSeq}")
    val (_, _, lambda, share) = out.head
    // exact second moment along e1: mean of a_i^2 over the 20 vectors
    val expect = vecs.map(a => a(0).toDouble * a(0)).sum / 20
    assert(lambda >= 0.95 * expect && lambda <= 1.01 * expect,
      s"Rayleigh estimate $lambda vs planted $expect")
    assert(share > 0.99 && share <= 1.0 + 1e-9,
      s"planted axis must carry ~all energy, share=$share")
    // the unit-direction invariant: sum v^2 ~ 1 (floor-quantized below)
    val n2 = v.map(x => x * x).sum
    assert(n2 <= 1.0 + 1e-6 && n2 > 0.99, s"direction not unit: $n2")
  }

  test("spectrum recovers a planted two-axis plane with orthogonal directions") {
    // vectors in span{e1, e2}: strong e1 energy, weaker e2 — the
    // deflated second direction must find e2, orthogonal to v1
    val vecs = (0 until 24).map { i =>
      val a = (2 + i % 3).toFloat * (if (i % 2 == 0) 1f else -1f)
      val b = 0.5f * (if (i % 4 < 2) 1f else -1f)
      Array(a, b, 0.0f, 0.0f)
    }
    val out = graft.operators.Similarity.spectrum(
        vecs.toDF("embedding"), dims = 4)
      .collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Double]("v1"), r.getAs[Double]("v2"),
          r.getAs[Double]("share1"), r.getAs[Double]("share2"),
          r.getAs[Double]("abs_cos12")))).toMap
    val (v11, v21, s1, s2, c) = out(1L)
    assert(math.abs(math.abs(v11) - 1.0) < 1e-3, s"v1 must be ±e1: $out")
    assert(math.abs(math.abs(out(2L)._2) - 1.0) < 1e-3, s"v2 must be ±e2: $out")
    assert(math.abs(v21) < 1e-3, "v2 has no e1 component")
    assert(c < 1e-3, s"directions must be orthogonal, cos=$c")
    // exact plane energies: share1 = sum a^2 / total, share2 the rest
    val ea = vecs.map(v => v(0).toDouble * v(0)).sum
    val eb = vecs.map(v => v(1).toDouble * v(1)).sum
    assert(math.abs(s1 - ea / (ea + eb)) < 0.01, s"share1=$s1 vs ${ea / (ea + eb)}")
    assert(math.abs(s2 - eb / (ea + eb)) < 0.01, s"share2=$s2 vs ${eb / (ea + eb)}")
    assert(math.abs(s1 + s2 - 1.0) < 0.01, "the plane carries all energy")
  }

  test("whiten removes a planted common mean + top direction (all-but-the-top)") {
    // every vector = common mean 0.3·e1 + ±0.2·e2 (the dominant
    // CENTERED direction) + a weak ±0.05·e3 ripple: after centering,
    // v1 must be ±e2, the residual's top direction ±e3, and the
    // energy ratio iso_gain ≈ (0.2/0.05)² = 16
    val vecs = (0 until 24).map { i =>
      Array(0.3f,
        0.2f * (if (i % 2 == 0) 1f else -1f),
        0.05f * (if (i % 4 < 2) 1f else -1f), 0.0f)
    }
    val out = graft.operators.Similarity.whiten(vecs.toDF("embedding"),
        dims = 4)
      .collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Double]("mu"), r.getAs[Double]("v1"),
          r.getAs[Double]("v2"), r.getAs[Double]("share1"),
          r.getAs[Double]("share2"), r.getAs[Double]("abs_cos12"),
          r.getAs[Double]("iso_gain")))).toMap
    assert(math.abs(out(1L)._1 - 0.3) < 1e-3, s"mean must be 0.3 e1: $out")
    assert(math.abs(out(2L)._1) < 1e-3 && math.abs(out(3L)._1) < 1e-3)
    assert(math.abs(math.abs(out(2L)._2) - 1.0) < 1e-3,
      s"v1 must be ±e2 after centering: $out")
    assert(math.abs(out(1L)._2) < 1e-3, "v1 has no e1 component (mean removed)")
    assert(math.abs(math.abs(out(3L)._3) - 1.0) < 1e-3,
      s"residual top direction must be ±e3: $out")
    val (_, _, _, s1, s2, c, gain) = out(1L)
    assert(c < 1e-3, s"deflation must stay orthogonal, cos=$c")
    assert(math.abs(s1 - 16.0 / 17.0) < 0.01, s"share1=$s1")
    assert(math.abs(s2 - 1.0 / 17.0) < 0.01, s"share2=$s2")
    assert(gain > 14.0 && gain < 18.0, s"iso_gain=$gain vs planted 16")
  }

  test("embed_jl: distortion ratios concentrate around 1 (JL lemma)") {
    val rows = SparkEntry.queries("embed_jl")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // unbiasedness: E[‖y_a−y_b‖²/‖x_a−x_b‖²] = 1 for ±1 projections
    val mean = rows.head.getAs[Double]("mean_ratio")
    assert(math.abs(mean - 1.0) < 0.15, s"mean_ratio $mean")
    // concentration: at t=16, σ(ratio) ≈ √(2/t) ≈ 0.35 — well over
    // half the pairs must land within ±0.5 of 1 (measured ~90%)
    val total = rows.head.getAs[Long]("n_pairs_total")
    val within = rows.filter { r =>
      val b = r.getAs[Int]("ratio_bin"); b >= 5 && b <= 14
    }.map(_.getAs[Long]("n_pairs")).sum
    assert(within.toDouble / total > 0.6,
      s"only $within/$total pairs within [0.5, 1.5)")
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === total)
  }
}
