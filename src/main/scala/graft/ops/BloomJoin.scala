package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-prefiltered join — the mechanism behind Spark's
  * InjectRuntimeFilter / Iceberg bloom pushdown, built from parts so
  * the cost model is inspectable: hash the (selective) build side's
  * keys into an m-bit, k-hash Bloom bit array, pull the PACKED array
  * to the driver (m/64 longs — the bounded artifact every broadcast
  * runtime filter ships; 64 KiB here), and test the probe side's
  * keys against the LITERAL array inside whole-stage codegen BEFORE
  * the shuffle. Probe rows that cannot join never pay the exchange;
  * false positives survive to the exact join, which removes them —
  * the filter moves cost, never answers. Hashes are Spark's xxhash64
  * (the same family as [[graft.sources.Warehouse.writeBloomManifest]]
  * — one derivation across the bloom tier).
  */
object BloomJoin {

  // hash the NORMALIZED key: xxhash64 hashes equal values of
  // DIFFERENT types differently (int 5 vs long 5 land on disjoint
  // positions), so a build side keyed by int and a probe side keyed
  // by long would produce FALSE NEGATIVES — matching probe rows
  // silently filtered out before the join. Integral and scale-0
  // decimal keys therefore canonicalize to long on BOTH sides (a
  // widening cast, value-preserving by construction); every other
  // type (string, binary, fractional) hashes as-is — a blanket
  // cast("long") there would NULL every non-numeric key and collapse
  // the filter to pass-everything. Non-integral build/probe key
  // types must match exactly (documented contract).
  private def normalize(df: DataFrame, keyCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(keyCol).cast("long")
      case d: DecimalType if d.scale == 0 && d.precision <= 18 =>
        col(keyCol).cast("long")
      case _ => col(keyCol)
    }
  }

  private def positions(c: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i =>
      pmod(xxhash64(lit(i.toLong), c), lit(m)).cast("int"))

  /** The packed bit array of the build side's keys: m bits as m/64
    * longs. One distributed aggregate (collect_set of positions —
    * bounded by min(m, |build|·k) ints) + a driver-side pack.
    */
  def buildBits(build: DataFrame, keyCol: String, m: Int,
      k: Int): Array[Long] = {
    require(m % 64 == 0, s"m must pack into longs: $m")
    val ps = build
      .select(explode(array(
        positions(normalize(build, keyCol), m, k): _*)).as("p"))
      .agg(collect_set(col("p")).as("ps"))
      .head().getSeq[Int](0)
    val bits = new Array[Long](m / 64)
    ps.foreach(p => bits(p / 64) |= (1L << (p % 64)))
    bits
  }

  /** Keep only probe rows whose key MIGHT be in the build side: all
    * k positions set in the literal array. Pure map work ahead of
    * the join's exchange; codegen'd (element_at + bit ops, no UDF).
    */
  def prefilter(probe: DataFrame, keyCol: String, bits: Array[Long],
      m: Int, k: Int): DataFrame = {
    val arr = typedLit(bits.toSeq)
    val cond = positions(normalize(probe, keyCol), m, k)
      .map(p => (element_at(arr, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), p % 64))
        =!= 0L))
      .reduce(_ && _)
    probe.filter(cond)
  }
}
