package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.{DedupHashing, MinHashBands, NGramHashSet, SimHash64,
  SortedIntersectSize, SortedLongIntersectSize, VocabHitCount}

/** Fixed-seed randomized properties for the hand-written kernels — the
  * custom Catalyst expressions and distributed primitives whose logic
  * the SQL oracles exercise only on the shapes present in the test
  * corpus. Each property checks the kernel against an INDEPENDENT
  * straight-line reimplementation of its spec over hundreds of random
  * inputs (seeded, so failures reproduce). */
class KernelPropertySpec extends SparkSpec {

  private val rnd = new Random(0x5eed5eedL)

  /** Independent md5-lower-64 (DuckDB md5_number_lower): little-endian
    * read of digest bytes 8..15 — deliberately NOT DedupHashing's
    * shift-loop formulation. */
  private def refMd5Lower64(s: String): Long =
    java.nio.ByteBuffer
      .wrap(MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8)), 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getLong

  private def wordsLit(ws: Seq[String]) =
    Literal.create(ws, ArrayType(StringType))

  // word pool with duplicates-by-construction and non-ASCII entries:
  // the expressions hash UTF8String bytes, the references hash
  // String.getBytes(UTF_8) — these must agree beyond ASCII
  private val pool = Vector("a", "b", "cat", "dog", "née", "日本", "x9",
    "the", "of", "zz", "", "naïve")
  private def randWords(max: Int): Seq[String] =
    Seq.fill(rnd.nextInt(max + 1))(pool(rnd.nextInt(pool.size)))

  test("md5Lower64 matches an independent little-endian reference") {
    for (_ <- 1 to 300) {
      val s = randWords(6).mkString(" ")
      val d = MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
      assert(DedupHashing.md5Lower64(d) === refMd5Lower64(s))
    }
  }

  test("NGramHashSet == sorted distinct md5 hashes of space-joined n-grams") {
    for (_ <- 1 to 300; n <- 1 to 3) {
      val ws = randWords(12)
      val got = NGramHashSet(wordsLit(ws), n).eval(null)
      if (ws.length < n) assert(got == null, s"ws=$ws n=$n")
      else {
        val want = ws.sliding(n).map(g => refMd5Lower64(g.mkString(" ")))
          .toArray.distinct.sorted
        assert(got.asInstanceOf[ArrayData].toLongArray.toSeq === want.toSeq,
          s"ws=$ws n=$n")
      }
    }
  }

  test("NGramHashList == per-position md5 hashes; set twin = its sorted distinct") {
    for (_ <- 1 to 300; n <- 1 to 3) {
      val ws = randWords(12)
      val got = graft.functions.NGramHashList(wordsLit(ws), n).eval(null)
      if (ws.length < n) assert(got == null, s"ws=$ws n=$n")
      else {
        val want = ws.sliding(n).map(g => refMd5Lower64(g.mkString(" "))).toArray
        val gotArr = got.asInstanceOf[ArrayData].toLongArray
        assert(gotArr.toSeq === want.toSeq, s"ws=$ws n=$n")
        // consistency with the set kernel: same hash space, positions kept
        val set = NGramHashSet(wordsLit(ws), n).eval(null)
          .asInstanceOf[ArrayData].toLongArray
        assert(gotArr.distinct.sorted.toSeq === set.toSeq, s"ws=$ws n=$n")
      }
    }
  }

  test("SortedLongIntersectSize == set intersection size on sorted inputs") {
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted
      val got = SortedLongIntersectSize(
        Literal.create(a, ArrayType(org.apache.spark.sql.types.LongType)),
        Literal.create(b, ArrayType(org.apache.spark.sql.types.LongType))).eval(null)
      assert(got === a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("SortedIntersectSize == set intersection size on sorted string inputs") {
    // ASCII-only: String ordering == UTF8String byte ordering there,
    // and the operator's contract is sorted-ascending inputs
    val asciiPool = Vector("a", "ab", "b", "ba", "c", "z", "zz", "0", "9x")
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(8))(asciiPool(rnd.nextInt(asciiPool.size)))
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(8))(asciiPool(rnd.nextInt(asciiPool.size)))
        .distinct.sorted
      val got = SortedIntersectSize(wordsLit(a), wordsLit(b)).eval(null)
      assert(got === a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("SimHash64 == per-bit majority vote over independent word hashes") {
    for (_ <- 1 to 200) {
      val ws = randWords(10)
      val got = SimHash64(wordsLit(ws)).eval(null).asInstanceOf[Long]
      val hs = ws.map(refMd5Lower64)
      val want = (0 until 64).foldLeft(0L) { (acc, j) =>
        val votes = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) acc | (1L << j) else acc
      }
      assert(got === want, s"ws=$ws")
    }
  }

  test("4x16-bit band pigeonhole is complete for Hamming <= 3") {
    // the blocking key formula from Dedup.simhashPairs: bandVal(sig, b)
    // = (sig >>> 16b) & 0xFFFF | b << 16. Any two signatures within
    // Hamming 3 must collide on at least one band — 3 flipped bits
    // cannot touch all 4 disjoint 16-bit slices.
    def bandVals(sig: Long): Seq[Long] =
      (0 until 4).map(b => (((sig >>> (b * 16)) & 0xFFFFL)) + (b.toLong << 16))
    for (_ <- 1 to 500) {
      val base = rnd.nextLong()
      val nFlips = rnd.nextInt(4) // 0..3
      val flipped = Seq.fill(nFlips)(rnd.nextInt(64))
        .foldLeft(base)((s, bit) => s ^ (1L << bit))
      assert(bandVals(base).intersect(bandVals(flipped)).nonEmpty,
        f"base=$base%016x flipped=$flipped%016x")
    }
  }

  test("MinHashBands == independent shingle/permute/band reimplementation") {
    val (numHashes, bands) = (16, 4)
    val (pa, pb) = DedupHashing.perms(numHashes)
    for (_ <- 1 to 200) {
      val ws = randWords(10)
      val got = MinHashBands(wordsLit(ws), numHashes, bands).eval(null)
      if (ws.length < 3) assert(got == null, s"ws=$ws")
      else {
        val shingles = ws.sliding(3).map(g =>
          refMd5Lower64(g.mkString(" ")) & 0x7FFFFFFFL).toSeq
        val sig = (0 until numHashes).map(j =>
          shingles.map(h => pa(j) * h + pb(j)).min)
        val rows = numHashes / bands
        val want = (0 until bands).map { b =>
          val slice = sig.slice(b * rows, (b + 1) * rows)
          refMd5Lower64(slice.mkString("", " ", " ") + b)
        }
        assert(got.asInstanceOf[ArrayData].toLongArray.toSeq === want, s"ws=$ws")
      }
    }
  }

  test("VocabHitCount == multiset membership count") {
    val vocab = Seq("the", "of", "a", "née")
    for (_ <- 1 to 300) {
      val ws = randWords(15)
      val got = VocabHitCount(wordsLit(ws), vocab).eval(null)
      assert(got === ws.count(vocab.contains), s"ws=$ws")
    }
  }

  test("CosineSimilarity == sequential double accumulation; codegen == interpreted") {
    import graft.functions.CosineSimilarity
    import org.apache.spark.sql.types.FloatType
    def floatVec(n: Int): Seq[Float] =
      Seq.fill(n)((rnd.nextInt(2000) - 1000) / 100.0f)
    def ref(a: Seq[Float], b: Seq[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until n) {
        val (x, y) = (a(i).toDouble, b(i).toDouble)
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cases = Seq.fill(100)((floatVec(8), floatVec(8))) :+
      (Seq.fill(8)(0.0f), floatVec(8)) // zero norm → defined 0.0
    for ((a, b) <- cases) {
      val got = CosineSimilarity(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null)
      assert(got === ref(a, b), s"a=$a b=$b")
    }
    // the DataFrame path runs doGenCode — same bits as the interpreted eval
    import graft.functions.VectorFunctions.cosineSim
    val s = spark
    import s.implicits._
    val rows = cases.take(20)
    val viaCodegen = rows.toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(viaCodegen.toSeq === rows.map { case (a, b) => ref(a, b) })
  }

  test("PQEncode/PQADCDist == independent argmin/sum over the distance identity") {
    import graft.functions.{PQADCDist, PQEncode}
    import org.apache.spark.sql.types.{BinaryType, FloatType}
    val (dim, subspaces, nCodes) = (8, 4, 5)
    val sub = dim / subspaces
    def subDist(v: Seq[Float], cw: Seq[Double], base: Int): Double = {
      var xx = 0.0; var xc = 0.0; var cc = 0.0
      for (i <- 0 until sub) {
        val x = v(base + i).toDouble; val w = cw(base + i)
        xx += x * x; xc += x * w; cc += w * w
      }
      (xx - 2 * xc) + cc
    }
    for (_ <- 1 to 100) {
      val cb: Seq[Seq[Double]] =
        Seq.fill(nCodes)(Seq.fill(dim)((rnd.nextInt(200) - 100) / 10.0))
      val v = Seq.fill(dim)((rnd.nextInt(200) - 100) / 10.0f)
      val wantCodes = (0 until subspaces).map { m =>
        (0 until nCodes).minBy(c => subDist(v, cb(c), m * sub)) // min ties → lowest
      }
      val gotCodes = PQEncode(Literal.create(v, ArrayType(FloatType)), cb, subspaces)
        .eval(null).asInstanceOf[Array[Byte]].map(_ & 0xFF).toSeq
      assert(gotCodes === wantCodes, s"v=$v cb=$cb")
      val q = Seq.fill(dim)((rnd.nextInt(200) - 100) / 10.0f)
      val wantAdc = (0 until subspaces)
        .map(m => subDist(q, cb(wantCodes(m)), m * sub)).reduceLeft(_ + _)
      val gotAdc = PQADCDist(
        Literal.create(q, ArrayType(FloatType)),
        Literal.create(wantCodes.map(_.toByte).toArray, BinaryType),
        cb, subspaces).eval(null)
      assert(gotAdc === wantAdc, s"q=$q codes=$wantCodes")
    }
  }

  test("NearestCentroid2D == brute-force argmin with lowest-cid ties; codegen agrees") {
    import graft.functions.NearestCentroid2D
    import org.apache.spark.sql.catalyst.InternalRow
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(6)
      // coarse grid coordinates force genuine distance ties; a
      // duplicated centroid under a higher cid must never win
      val cents = (0 until k).map(c =>
        (c, rnd.nextInt(5).toDouble, rnd.nextInt(5).toDouble)) ++
        Seq((k, rnd.nextInt(5).toDouble, rnd.nextInt(5).toDouble))
      val sorted = cents.sortBy(_._1)
      val (x, y) = (rnd.nextInt(5).toDouble, rnd.nextInt(5).toDouble)
      val want = sorted.minBy { case (cid, cx, cy) =>
        ((x - cx) * (x - cx) + (y - cy) * (y - cy), cid)
      }._1
      val got = NearestCentroid2D(Literal(x), Literal(y),
        sorted.map(_._1).toArray, sorted.map(_._2).toArray,
        sorted.map(_._3).toArray).eval(null).asInstanceOf[InternalRow]
      assert(got.getInt(0) === want, s"p=($x,$y) cents=$sorted")
    }
    // codegen path (DataFrame) == interpreted eval
    import graft.functions.KMeansExpressions.nearestCentroid
    val s = spark
    import s.implicits._
    val cents = Seq((0, 1.0, 1.0), (1, 3.0, 1.0), (2, 1.0, 1.0)) // dup of cid 0
    val pts = Seq((0.0, 0.0), (2.0, 1.0), (4.0, 2.0), (1.0, 1.0))
    val viaDf = pts.toDF("x", "y")
      .select(nearestCentroid(col("x"), col("y"), cents).as("n"))
      .select(col("n.cid")).as[Int].collect().toSeq
    // (2,1) is equidistant from cid 0 and cid 1 → lowest cid wins;
    // (1,1) sits exactly on the duplicated centroid → cid 0, never 2
    assert(viaDf === Seq(0, 0, 1, 0), "ties must break to the lowest cid in codegen too")
  }

  test("NearestCentroidND == brute-force argmin over the distance identity") {
    import graft.operators.KMeansND
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.FloatType
    for (_ <- 1 to 200) {
      val dim = 4
      val k = 1 + rnd.nextInt(5)
      val cents = (0 to k).map(c =>
        c -> Array.fill(dim)(rnd.nextInt(4).toDouble))
      val v = Seq.fill(dim)(rnd.nextInt(4).toFloat)
      // reference uses the SAME identity ((|x|^2 - 2x.c) + |c|^2) with
      // sequential accumulation — bit-compatible with the kernel and
      // the DuckDB oracle's list_dot_product formulation
      def dist(cv: Array[Double]): Double = {
        var na = 0.0; var dot = 0.0; var nc = 0.0
        for (i <- 0 until dim) {
          val x = v(i).toDouble
          na += x * x; dot += x * cv(i); nc += cv(i) * cv(i)
        }
        (na - 2 * dot) + nc
      }
      val want = cents.minBy { case (cid, cv) => (dist(cv), cid) }._1
      val sorted = cents.sortBy(_._1)
      val got = KMeansND.NearestCentroidND(
        Literal.create(v, ArrayType(FloatType)),
        sorted.map(_._1).toArray, sorted.map(_._2).toArray,
        sorted.map(c => KMeansND.norm2(c._2)).toArray)
        .eval(null).asInstanceOf[InternalRow]
      assert(got.getInt(0) === want, s"v=$v cents=${cents.map(_._2.toSeq)}")
      assert(got.getDouble(1) === dist(cents.toMap.apply(want)), "dist must match")
    }
  }

  test("MisraGries keeps every item above n/k through random partition merges") {
    import graft.functions.MisraGries
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val agg = MisraGries(BoundReference(0, org.apache.spark.sql.types.StringType,
      nullable = false), k = 8)
    for (trial <- 1 to 100) {
      // zipf-ish stream: a few heavy items over a long uniform tail
      val heavy = Seq.fill(200)(s"h${rnd.nextInt(3)}")
      val tail = Seq.fill(300)(s"t${rnd.nextInt(150)}")
      val stream = rnd.shuffle(heavy ++ tail)
      val n = stream.length
      // random partitioning, then a random merge order — the summary
      // must be insensitive to both for the superset guarantee
      val parts = stream.grouped(1 + rnd.nextInt(120)).toSeq.map { p =>
        p.foldLeft(agg.createAggregationBuffer()) { (b, w) =>
          agg.update(b, InternalRow(UTF8String.fromString(w)))
        }
      }
      val merged = rnd.shuffle(parts).reduceLeft(agg.merge)
      val cand = agg.eval(merged).asInstanceOf[ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
      assert(cand.size <= 8, "summary must stay k-bounded")
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      for ((w, c) <- counts if c > n / 8.0)
        assert(cand.contains(w),
          s"trial $trial: '$w' (count $c > n/k=${n / 8.0}) missing from $cand")
    }
  }

  test("TopKStructs == full-sort top-k across random multi-partition data") {
    import graft.functions.TopKAggregate.topk
    val s = spark
    import s.implicits._
    for (trial <- 1 to 3) {
      val n = 400
      // duplicate scores force deterministic id tie-breaks through the
      // heap's struct ordering, same as the full sort's
      val data = Seq.tabulate(n)(i =>
        (rnd.nextInt(5), rnd.nextInt(40).toDouble / 4, i.toLong))
      val df = data.toDF("key", "score", "id").repartition(7)
      val got = df.groupBy("key")
        .agg(topk(struct((-col("score")).as("ns"), col("id").as("i")), 5).as("top"))
        .select(col("key"), posexplode(col("top")).as(Seq("rk", "t")))
        .select(col("key"), col("rk"), col("t.i").as("id"))
        .as[(Int, Int, Long)].collect().toSet
      val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(5).zipWithIndex
          .map { case (r, rk) => (k, rk, r._3) }
      }.toSet
      assert(got === want, s"trial=$trial")
    }
  }

  test("connectedComponents == union-find reference on random graphs (both paths)") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 3) {
      val nodes = Seq.fill(30)(rnd.nextLong().abs % 1000L).distinct
      val edges = Seq.fill(40)(
        (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
        .filter { case (a, b) => a != b }
      // reference union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.groupBy(find).toSeq
        .flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
      val pairs = edges.toDF("id_a", "id_b")
      for (thresh <- Seq(1000000L, 0L)) {
        val got = graft.operators.Dedup
          .connectedComponents(pairs, localEdgeThreshold = thresh)
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"trial=$trial thresh=$thresh edges=$edges")
      }
      // the star-contraction path must agree with the same ground truth
      val gotStar = graft.operators.Dedup.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(gotStar === want, s"trial=$trial star edges=$edges")
    }
  }
}
