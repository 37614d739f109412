package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic scale-factor amplifier for scale-up measurements
  * (SCALING.md): writes `<out>` as `factor`× the `<in>` corpus.
  *
  *  - `documents`: each copy `i` offsets doc_id by i·10M and rewrites
  *    `text` through a letter-ROTATION cipher (rot-i over a-z). A
  *    substitution cipher keeps every copy internally ISOMORPHIC to
  *    the original (same token structure, lengths, duplicate pairs,
  *    shingle relationships — so per-copy near-dup density is exactly
  *    the original's) while cross-copy vocabularies are disjoint
  *    (copies don't near-dup against each other). The cipher only
  *    substitutes lowercase a–z: tokens made of digits or uppercase
  *    would be fixed points shared across copies — the synthetic
  *    documents corpus is all-lowercase words (verified: 0 shared
  *    tokens between copies at factor 10), so the invariant holds
  *    here; a corpus with significant non-lowercase vocabulary would
  *    need a stronger transform — i.e. 10× data
  *    means 10× clusters of the same size, not clusters 10× as big,
  *    which is what "more of the same corpus" means for a dedup
  *    pipeline. `n_chars` stays valid (translate preserves length).
  *  - `embeddings`: copies with vec_id offset by i·10M. By default the
  *    vector VALUES are reused verbatim — every copy is an exact
  *    duplicate of the original, so cross-copy near-dup pairs grow
  *    QUADRATICALLY with the factor (the round-8 semdedup scale rows
  *    measured against exactly that adversarial amplification). The
  *    optional 4th argument `dupCopies` fixes the duplicate DENSITY
  *    instead: the first `dupCopies` copies stay verbatim, and every
  *    later copy gets a per-copy DIMENSION ROTATION (dims cyclically
  *    shifted by 7·i mod dims — cosine between two vectors is
  *    invariant under a common permutation, so each copy's INTERNAL
  *    pair structure is exactly the original's, while cross-copy
  *    cosines scramble; the rot-cipher idea applied to vectors). With
  *    dupCopies held constant across factors, duplicate pairs grow
  *    LINEARLY — the constant-density regime a real corpus exhibits.
  *  - `events`: copies with event_id/user_id offsets and UNCHANGED
  *    timestamps — the streaming scale model (same horizon, N× the
  *    concurrent users → N× window groups and state).
  *  - `orders`/`lineitem`: copies offset only o_orderkey/l_orderkey
  *    (the fact-side keys), preserving each copy's exact 1:N
  *    orders↔lineitem structure; dim keys stay unchanged against the
  *    verbatim dims — the "N× facts, same dims" model (a fact table
  *    grows by more orders per customer, not more customers).
  *  - dims (`region nation customer supplier part`): copied verbatim.
  *
  *  - optional 5th argument `vocabSlices` (default 1 = off) slices
  *    the DOCUMENT vocabulary per doc group: every token of a doc in
  *    group g (= doc_id % slices) gains a fixed-width `zq<gg>`
  *    PREFIX, so terms are shared only WITHIN a group AND each
  *    group's vocabulary is a CONTIGUOUS range of the term sort
  *    order (a suffix would interleave every group's variants of a
  *    word, defeating term-ranged file surgery). The synthetic
  *    corpus's one shared vocabulary makes every doc touch every
  *    term — an adversarial worst case for touched-term index
  *    maintenance (deleting ANY batch recomputes ~the whole stats
  *    table; the SCALING caveat on the r14 DeleteProf/UpdateProf
  *    BM25 rows). Real corpora have document-local vocabularies;
  *    with slices, a takedown batch's touched-term and touched-file
  *    counts follow the BATCH (its docs' groups), not the corpus —
  *    the honest maintenance fixture. Token lengths change, so
  *    `n_chars` and the dedup density invariants do NOT survive this
  *    knob: use it for the maintenance profs only.
  *
  * Usage: `sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1 10 [dupCopies] [vocabSlices] [idStride]"`
  *
  * Factors past 26 CHAIN: run ScaleGen over a ScaleGen output with
  * `idStride` raised past the first pass's id ceiling (e.g.
  * 26× then ×4 at stride 1e9 = 104×). Rotation keys repeat across
  * passes, so chained fixtures carry exact-duplicate TEXT across
  * distinct doc_ids — fine for the index/BM25 maintenance profs,
  * fatal for the dedup density invariants (which vocabSlices already
  * breaks; same profs-only caveat).
  */
object ScaleGen {

  val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // embedding copies kept verbatim (exact duplicates); the rest are
    // dimension-rotated. Default = factor, i.e. the historical
    // all-duplicates behavior.
    val dupCopies = if (args.length > 3) args(3).toInt else factor
    val vocabSlices = if (args.length > 4) args(4).toInt else 1
    require(vocabSlices >= 1 && vocabSlices <= 100,
      "vocabSlices must be in [1, 100] (two-digit group prefixes)")
    // CHAINED amplification (a >26× fixture = ScaleGen over a
    // ScaleGen output, the rotation cipher's keyspace composing
    // across passes) carries ids above the default stride — pass a
    // larger one. Powers of ten ≥ 1e6 are ≡ 0 (mod 64), preserving
    // the vocabSlices copies-stay-in-group invariant.
    val stride = if (args.length > 5) args(5).toLong else IdStride
    require(stride >= IdStride && stride % 64 == 0,
      s"idStride must be >= $IdStride and ≡ 0 (mod 64), got $stride")
    // rot(i) wraps at 26: copy 26 would be byte-identical to copy 0,
    // silently injecting a full corpus of exact duplicates
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (rotation cipher has 26 distinct keys), got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))

    val az = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = az.drop(i % 26) + az.take(i % 26)

    // the i·stride offsets are collision-free only if every input id
    // fits under the stride — an oversized id would silently land in
    // another copy's range (duplicate keys, phantom exact-dup pairs)
    def requireIdsUnder(df: org.apache.spark.sql.DataFrame,
                        idCol: String, table: String): Unit = {
      val mx = df.agg(max(col(idCol))).collect()(0)
      if (!mx.isNullAt(0))
        require(mx.getLong(0) < stride,
          s"$table.$idCol max ${mx.getLong(0)} >= stride $stride: " +
            "copy offsets would collide; raise stride")
    }

    val docs = Tables.load(spark, in, "documents")
    requireIdsUnder(docs, "doc_id", "documents")
    val amplified = (0 until factor).map { i =>
      docs.select((col("doc_id") + lit(i * stride)).as("doc_id"),
        translate(col("text"), az, rot(i)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val sliced =
      if (vocabSlices == 1) amplified
      else (0 until vocabSlices).map { g =>
        // group by the ORIGINAL id (mod the stride) so every rotated
        // copy of a doc lands in the same group — group vocabularies
        // stay disjoint across copies AND groups
        amplified
          .filter(pmod(pmod(col("doc_id"), lit(stride)),
            lit(vocabSlices.toLong)) === lit(g.toLong))
          .withColumn("text", regexp_replace(col("text"),
            "([a-z0-9]+)", f"zq$g%02dx$$1"))
      }.reduce(_ unionByName _)
    sliced
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.load(spark, in, "embeddings")
    requireIdsUnder(emb, "vec_id", "embeddings")
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    // the rotation guard mirrors rot(i)'s factor<=26 wrap guard: a
    // rotated copy whose shift is 0 (7i ≡ 0 mod dims) would be a
    // VERBATIM duplicate past dupCopies, and two rotated copies
    // sharing a shift are exact duplicates of each other — both
    // silently reintroduce the quadratic duplicate growth dupCopies
    // exists to remove
    locally {
      val shifts = (dupCopies until factor).map(i => (7 * i) % dims)
      require(!shifts.contains(0),
        s"dimension rotation wraps to 0 for some copy (dims=$dims): " +
          "a 'rotated' copy would be verbatim; use a corpus whose " +
          "dims is coprime with 7 or lower the factor")
      require(shifts.distinct.size == shifts.size,
        s"two rotated copies share a shift (dims=$dims): they would " +
          "be exact duplicates of each other; lower the factor")
    }
    (0 until factor).map { i =>
      // copies < dupCopies: verbatim (exact cross-copy duplicates);
      // later copies: dims rotated by 7·i mod dims — internal cosine
      // structure preserved exactly, cross-copy pairs scrambled
      val v =
        if (i < dupCopies) col("embedding")
        else {
          val shift = (7 * i) % dims
          concat(slice(col("embedding"), shift + 1, dims - shift),
            slice(col("embedding"), 1, shift))
        }
      emb.select((col("vec_id") + lit(i * stride)).as("vec_id"),
        v.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: copies shift user_id/event_id, timestamps UNCHANGED —
    // the streaming scale model (same wall-clock horizon, N× the
    // concurrent users, so window groups and join/dedup state grow
    // with users while watermark behavior is identical). Written back
    // as a single raw-schema file (ts stays a µs TIMESTAMP) because
    // the q29 staging path copies `events.parquet` as one file.
    val ev = spark.read.schema(Tables.eventsRawSchema)
      .parquet(s"$in/events.parquet")
    requireIdsUnder(ev, "event_id", "events")
    requireIdsUnder(ev, "user_id", "events")
    val evOut = (0 until factor).map { i =>
      ev.select((col("event_id") + lit(i * stride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * stride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
    val evTmp = Paths.get(out, "_events_build")
    evOut.coalesce(1).write.mode("overwrite").parquet(evTmp.toString)
    val ls = Files.list(evTmp)
    val part =
      try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
    Files.move(part, Paths.get(out, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val wk = Files.walk(evTmp)
    try wk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally wk.close()

    // TPC-H facts: the "N× facts, same dims" scale model — orders and
    // lineitem copies offset ONLY the orderkey (the fact-side key), so
    // each copy keeps the exact orders↔lineitem 1:N structure, while
    // dim keys (custkey/partkey/suppkey) stay unchanged against the
    // verbatim dim tables: joins stay valid with N× fan-in per dim row
    // (more orders per customer — how a fact table actually grows),
    // filter selectivities and value distributions are the original's
    val ord = Tables.load(spark, in, "orders")
    requireIdsUnder(ord, "o_orderkey", "orders")
    (0 until factor).map { i =>
      ord.select((col("o_orderkey") + lit(i * stride)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = Tables.load(spark, in, "lineitem")
    requireIdsUnder(li, "l_orderkey", "lineitem")
    (0 until factor).map { i =>
      li.select((col("l_orderkey") + lit(i * stride)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Files.copy(Paths.get(s"$in/$t.parquet"),
        Paths.get(s"$out/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[scalegen] wrote $out = $factor x $in")
    spark.stop()
  }
}
