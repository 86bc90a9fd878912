package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filtered selective fact⋈dim join — the PRODUCTION face of
  * the `q_bloom_prune` / `q_bloom_prune_shuffle` audit pair: a user
  * gets the regime switch without re-deriving it. The filter drops
  * fact rows BEFORE the join's shuffle; the final inner join removes
  * the filter's false positives, so the result is exactly
  * `fact.join(dim, key)` (the spec proves it in both regimes — no
  * false negative is possible by construction, every dim key set its
  * own bits).
  *
  * Regime pick, by the bit-array size m = next pow2 ≥ bitsPerKey·|dim|
  * (the data-sized rule both audit keys gate):
  *   - m ≤ `broadcastBitsMax` → ONE broadcast bit set, k hash-probe
  *     broadcast joins on the fact (zero pre-join shuffles) — the
  *     q_bloom_prune shape;
  *   - past it (at 10⁹ keys m is ~1 GiB — beyond any broadcast) the
  *     filter state itself SHARDS: per-shard packed 64-bit words
  *     joined co-partitioned on an independent shard hash
  *     (SHUFFLE_HASH hinted), riding the hash-partitioning the
  *     protected join pays anyway — the q_bloom_prune_shuffle shape.
  *
  * Cost note: the filter pays one `dim.count()` (the m sizing — a
  * 1-row agg over the small side) plus the bit-set build; it wins
  * when the fact side is large and the join selective, which is the
  * only regime a runtime filter is FOR. */
object RuntimeFilter {

  /** md5 → first 8 hex chars → u32, the shared hash kernel behind the
    * runtime filter AND TxLog's bloom envelopes (whose driver-side
    * membership twin `bloomBit` replicates it bit-for-bit in JVM
    * Scala — ONE definition here keeps the three faces in sync). */
  private[graft] def u32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Shard layout for the sharded regime: (shard count, bits per
    * shard). The user's `shards` is a FLOOR — shards auto-scale with
    * m so one shard's packed word map stays ≤ 2²² bits (512 KiB of
    * payload, ~2 MiB as a map cell): a fixed 32 shards at m = 2³³
    * would push ~64 MiB through the shuffle as ONE map value per
    * shard and stress the probe. Both inputs pow2 ⇒ both outputs
    * pow2 and nsh·mP = m exactly; mP is Long throughout, which also
    * removes the old Int overflow in m/shards. nsh is also CAPPED at
    * m: a caller-degenerate layout (shards > m, reachable with a
    * small dim and a lowered broadcastBitsMax) would otherwise plan
    * mP = 0, and pmod(x, 0) is NULL — every hit() predicate null,
    * filteredJoin silently empty. One shard per bit is the most a
    * plan can mean. Spec-pinned at synthetic large m and at the
    * shards > m corner. */
  private[graft] def shardPlan(m: Long, shards: Int): (Long, Long) = {
    val nsh = math.min(m, math.max(shards.toLong, m >> 22)) // all pow2
    val mP = m / nsh
    assert(mP >= 1L && mP <= (1L << 22), s"shard cell out of range: $mP bits")
    (nsh, mP)
  }

  def filteredJoin(fact: DataFrame, dim0: DataFrame, key: String,
      bitsPerKey: Int = 8, k: Int = 3, shards: Int = 32,
      broadcastBitsMax: Long = 1L << 29 /* 64 MiB of bits */): DataFrame = {
    require(k >= 1 && k <= 8, s"1..8 hash probes, got $k")
    require(Integer.bitCount(shards) == 1, s"shards must be pow2: $shards")
    // the probe writes working columns under fixed names; a fact
    // schema already carrying one would be silently REPLACED by
    // withColumn and then dropped — fail loudly instead
    val reserved = ("__shard" +: "__bm" +:
      (1 to k).flatMap(i => Seq(s"__b$i", s"__h$i"))).toSet
    val clash = fact.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"fact schema uses filteredJoin's reserved working columns: " +
        clash.toSeq.sorted.mkString(", "))
    val dim = dim0.localCheckpoint(true) // sized once, probed once
    val nDim = dim.select(col(key)).distinct().count()
    val m = math.max(1024, java.lang.Long.highestOneBit(
      math.max(1L, bitsPerKey.toLong * nDim - 1)) * 2)
    val dimKeys = dim.select(col(key).as("__k")).distinct()
    val passed =
      if (m <= broadcastBitsMax) {
        // broadcast regime: global bit set, k broadcast hash probes
        def bkt(i: Int, c: Column): Column =
          pmod(u32(concat(lit(s"bf$i:"), c.cast("string"))), lit(m))
        val bits = dimKeys.select(explode(array(
          (1 to k).map(i => bkt(i, col("__k"))): _*)).as("bit")).distinct()
        val probed = (1 to k).foldLeft(
          (1 to k).foldLeft(fact)((df, i) =>
            df.withColumn(s"__b$i", bkt(i, col(key))))
        )((df, i) => df.join(
          broadcast(bits.select(col("bit").as(s"__b$i"),
            lit(1).as(s"__h$i"))), Seq(s"__b$i"), "left"))
        val pass = (1 to k).map(i => col(s"__h$i").isNotNull).reduce(_ && _)
        probed.where(pass)
          .drop((1 to k).flatMap(i => Seq(s"__b$i", s"__h$i")): _*)
      } else {
        // sharded regime: per-shard packed words, co-partitioned join
        // (shard count auto-scales with m — see shardPlan)
        val (nsh, mP) = shardPlan(m, shards)
        def shardOf(c: Column): Column =
          pmod(u32(concat(lit("bfs:"), c.cast("string"))), lit(nsh))
        def bkt(i: Int, c: Column): Column =
          pmod(u32(concat(lit(s"bf$i:"), c.cast("string"))), lit(mP))
        val packed = dimKeys
          .select(shardOf(col("__k")).as("__shard"),
            explode(array((1 to k).map(i => bkt(i, col("__k"))): _*))
              .as("bit"))
          .distinct()
          .groupBy(col("__shard"), expr("bit div 64").as("word"))
          .agg(expr("bit_or(shiftleft(cast(1 as bigint), " +
            "cast(bit % 64 as int)))").as("mask"))
          .groupBy("__shard")
          .agg(map_from_entries(sort_array(
            collect_list(struct(col("word"), col("mask"))))).as("__bm"))
        val probed = (1 to k).foldLeft(
            fact.withColumn("__shard", shardOf(col(key))))((df, i) =>
            df.withColumn(s"__b$i", bkt(i, col(key))))
          .join(packed.hint("SHUFFLE_HASH"), Seq("__shard"), "left")
        def hit(i: Int): Column = (coalesce(
          try_element_at(col("__bm"), expr(s"__b$i div 64")), lit(0L))
          .bitwiseAND(expr(s"shiftleft(cast(1 as bigint), " +
            s"cast(__b$i % 64 as int))"))
          =!= 0L)
        probed.where((1 to k).map(hit).reduce(_ && _))
          .drop("__shard" +: "__bm" +: (1 to k).map(i => s"__b$i"): _*)
      }
    // the real join — removes the filter's false positives; its
    // shuffle now carries only the surviving fact rows
    passed.join(dim, Seq(key))
  }
}
