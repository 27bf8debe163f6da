package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key: logical node + planner strategy +
  * physical plan, the (c)-tier extension path from SURVEY §4.
  *
  * Semantics: for each key group, exactly the rows that
  * `row_number() OVER (PARTITION BY keys ORDER BY order DESC, tie ASC)
  * <= k` would keep, including Spark's default null ordering for those
  * directions (order: DESC NULLS LAST, tie: ASC NULLS FIRST). `order`
  * and `tie` may be any orderable types — the comparison is a real
  * SortOrder evaluation, not a numeric cast.
  *
  * Scale shape vs the window formulation: a window sorts EVERY group
  * fully after shuffling EVERY row. Here the planner emits
  *   partial TopKExec (map-side, bounded heaps, no distribution req)
  *   → shuffle on keys → final TopKExec,
  * so at most k rows per (partition × key) cross the wire and nothing
  * is ever fully sorted. The same plan shape Spark uses for
  * partial/final aggregation, applied to top-k pruning.
  *
  * Memory contract: each task holds k rows per distinct key, up to
  * `graft.topk.maxKeysPerPartition` (default 4M) distinct keys —
  * O(k × maxKeys), the same bound as a hash aggregate. Beyond the cap
  * the operator DEGRADES instead of failing (round-2 verdict item):
  *  - a PARTIAL exec flushes its heaps to the output stream and starts
  *    a fresh map — chunked pruning is still a correct superset (any
  *    row in the partition's true top-k is in its chunk's top-k, since
  *    fewer than k stronger same-key rows can precede it anywhere);
  *  - the FINAL exec keeps updating the keys it already tracks and
  *    fans out rows of NEW keys to 64 hash-bucketed local spill files,
  *    then recurses per file (keys are routed consistently, so heap
  *    keys and spill keys are disjoint and each spilled key's rows are
  *    all in one file). Recursion re-salts the bucket hash; at depth 8
  *    (64⁸ buckets) it fails fast rather than loop on an adversarial
  *    key distribution.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans TopKPerKey as partial → (shuffle) → final. Registered via
  * `spark.experimental.extraStrategies` (see operators.TopK) or
  * GraftExtensions. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tie, k, child) =>
      val maxKeys = org.apache.spark.sql.SparkSession.active.conf
        .get(TopKPerKeyExec.MaxKeysConfKey, TopKPerKeyExec.DefaultMaxKeysPerPartition.toString)
        .toInt
      TopKPerKeyExec(keys, order, tie, k, partial = false, maxKeys,
        TopKPerKeyExec(keys, order, tie, k, partial = true, maxKeys,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyExec {
  /** Distinct-keys-per-task threshold at which the in-memory heap map
    * stops growing and the degrade path engages. */
  val DefaultMaxKeysPerPartition: Int = 4 << 20
  val MaxKeysConfKey = "graft.topk.maxKeysPerPartition"
  val SpillFanout = 64
  val MaxSpillDepth = 8
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    partial: Boolean,
    maxKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // empty keys = GLOBAL top-k: the partial execs prune each input
    // partition to k rows, the final exec merges them in one task
    // (ClusteredDistribution(Nil) is rejected by Spark)
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order
    val tieExpr = tie
    val childOutput = child.output
    val kk = k
    val cap = maxKeys
    val isPartial = partial
    val nFields = childOutput.size
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rankProj = UnsafeProjection.create(Seq(ordExpr, tieExpr), childOutput)
      // Row strength = its sort position under (order DESC, tie ASC)
      // with those directions' default null ordering — the exact
      // ordering of the row_number window this operator replaces.
      val strength = RowOrdering.create(Seq(
        SortOrder(BoundReference(0, ordExpr.dataType, ordExpr.nullable), Descending),
        SortOrder(BoundReference(1, tieExpr.dataType, tieExpr.nullable), Ascending)),
        Seq.empty)
      val runner = new TopKPartitionRunner(keyProj, rankProj, strength, kk, cap, nFields)
      if (isPartial) runner.partialChunked(rows)
      else runner.finalWithSpill(rows, depth = 0)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Per-task top-k machinery shared by the partial and final paths. */
private[plans] class TopKPartitionRunner(
    keyProj: UnsafeProjection,
    rankProj: UnsafeProjection,
    strength: Ordering[InternalRow],
    k: Int,
    maxKeys: Int,
    nFields: Int) {

  // per key: a heap whose head is the WEAKEST kept row (largest sort
  // position).
  private implicit val weakestFirst: Ordering[(UnsafeRow, UnsafeRow)] =
    strength.on[(UnsafeRow, UnsafeRow)](_._1)

  private type Heaps = mutable.HashMap[UnsafeRow, mutable.PriorityQueue[(UnsafeRow, UnsafeRow)]]

  private def offer(heap: mutable.PriorityQueue[(UnsafeRow, UnsafeRow)], row: InternalRow): Unit =
    if (heap.size < k) {
      heap.enqueue((rankProj(row).copy(), row.asInstanceOf[UnsafeRow].copy()))
    } else if (strength.compare(rankProj(row), heap.head._1) < 0) {
      // strictly stronger than the weakest kept row → replace
      heap.dequeue()
      heap.enqueue((rankProj(row).copy(), row.asInstanceOf[UnsafeRow].copy()))
    }

  private def drain(heaps: Heaps): Iterator[InternalRow] =
    heaps.valuesIterator.flatMap(_.iterator.map(_._2: InternalRow))

  /** PARTIAL: prune in chunks of ≤ maxKeys distinct keys; each chunk's
    * per-key top-k goes to the output and the map resets. Correct as a
    * pruning stage: a row in the true partition top-k of its key has
    * < k stronger same-key rows in its own chunk, so it survives. */
  def partialChunked(rows: Iterator[InternalRow]): Iterator[InternalRow] = {
    var pending: InternalRow = null
    def nextChunk(): Iterator[InternalRow] = {
      if (pending == null && !rows.hasNext) return null
      val heaps: Heaps = mutable.HashMap.empty
      if (pending != null) {
        val key = keyProj(pending)
        val h = mutable.PriorityQueue.empty[(UnsafeRow, UnsafeRow)]
        heaps.update(key.copy(), h)
        offer(h, pending)
        pending = null
      }
      var tripped = false
      while (rows.hasNext && !tripped) {
        val row = rows.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) => offer(h, row)
          case None =>
            if (heaps.size >= maxKeys) {
              // chunk full — this row opens the next chunk
              pending = row.asInstanceOf[UnsafeRow].copy()
              tripped = true
            } else {
              val h = mutable.PriorityQueue.empty[(UnsafeRow, UnsafeRow)]
              heaps.update(key.copy(), h)
              offer(h, row)
            }
        }
      }
      drain(heaps)
    }
    new Iterator[InternalRow] {
      private var cur: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!cur.hasNext) {
          val n = nextChunk()
          if (n == null) return false
          cur = n
        }
        true
      }
      override def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
    }
  }

  /** FINAL: exact per-key top-k. Keys beyond the cap fan out to
    * hash-bucketed local spill files (routing is consistent, so heap
    * and spill key sets are disjoint); each file is then processed
    * recursively with a re-salted bucket hash. */
  // one scratch buffer per task for spill serialization — allocating
  // per spilled row would generate GBs of garbage exactly when memory
  // is already tight
  private lazy val spillScratch = new Array[Byte](1 << 16)

  /** Spill directory: the first configured Spark local dir (the disks
    * provisioned for shuffle/spill), not java.io.tmpdir — /tmp is
    * often a small RAM-backed tmpfs on clusters, which would defeat
    * the spill. */
  private def spillDir(): File = {
    val dir = Option(org.apache.spark.SparkEnv.get)
      .map(env => env.conf.get("spark.local.dir",
        System.getProperty("java.io.tmpdir")).split(",")(0).trim)
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val f = new File(dir)
    if (f.isDirectory) f else new File(System.getProperty("java.io.tmpdir"))
  }

  def finalWithSpill(rows: Iterator[InternalRow], depth: Int): Iterator[InternalRow] = {
    val heaps: Heaps = mutable.HashMap.empty
    var spillFiles: Array[File] = null
    var spillOuts: Array[DataOutputStream] = null
    def bucketOf(key: UnsafeRow): Int = {
      val h = scala.util.hashing.byteswap32(key.hashCode() ^ (depth * 0x9E3779B9))
      (h & Int.MaxValue) % TopKPerKeyExec.SpillFanout
    }
    rows.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) => offer(h, row)
        case None =>
          if (heaps.size >= maxKeys) {
            if (depth >= TopKPerKeyExec.MaxSpillDepth) {
              throw new IllegalStateException(
                s"TopKPerKeyExec: key cardinality still exceeds $maxKeys per task after " +
                  s"${TopKPerKeyExec.MaxSpillDepth} spill fan-outs — " +
                  "use the window formulation (row_number) for this key domain")
            }
            if (spillOuts == null) {
              val dir = spillDir()
              spillFiles = Array.fill(TopKPerKeyExec.SpillFanout)(
                File.createTempFile("graft-topk-spill", ".bin", dir))
              spillOuts = spillFiles.map(f => new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(f), 1 << 16)))
              val files = spillFiles
              Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
                files.foreach(f => if (f.exists()) f.delete())
              })
            }
            val u = row.asInstanceOf[UnsafeRow]
            val out = spillOuts(bucketOf(key))
            out.writeInt(u.getSizeInBytes)
            u.writeToStream(out, spillScratch)
          } else {
            val h = mutable.PriorityQueue.empty[(UnsafeRow, UnsafeRow)]
            heaps.update(key.copy(), h)
            offer(h, row)
          }
      }
    }
    if (spillOuts == null) drain(heaps)
    else {
      spillOuts.foreach(_.close())
      val files = spillFiles
      // release the heap map once its rows are emitted, BEFORE the
      // recursive spill processing allocates its own — otherwise a
      // deep fan-out would hold every ancestor level's heaps at once
      val head = drain(heaps)
      val releasing = new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val h = head.hasNext
          if (!h) heaps.clear()
          h
        }
        override def next(): InternalRow = head.next()
      }
      releasing ++ files.iterator.flatMap { f =>
        if (f.length() == 0) { f.delete(); Iterator.empty }
        else finalWithSpill(readSpill(f), depth + 1)
      }
    }
  }

  /** Stream UnsafeRows back from a spill file; deletes it at EOF. */
  private def readSpill(f: File): Iterator[InternalRow] = new Iterator[InternalRow] {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f), 1 << 16))
    private var done = false
    private var nextLen = readLen()
    private def readLen(): Int =
      try in.readInt()
      catch { case _: java.io.EOFException => in.close(); f.delete(); done = true; -1 }
    override def hasNext: Boolean = !done
    override def next(): InternalRow = {
      val bytes = new Array[Byte](nextLen)
      in.readFully(bytes)
      val row = new UnsafeRow(nFields)
      row.pointTo(bytes, nextLen)
      nextLen = readLen()
      row
    }
  }
}
