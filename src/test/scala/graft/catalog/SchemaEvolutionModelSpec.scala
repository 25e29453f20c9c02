package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Model-based SCHEMA-evolution testing, the DDL complement to
  * MvccModelSpec's DML sequences: drive a GraftTable with seeded random
  * interleavings of insert / computed add_column (referencing the base or
  * earlier computed columns) / drop_column / rename_column / cascading
  * update / delete / compact / revert, and mirror schema AND data in an
  * in-memory model whose computed columns are plain Scala closures.
  * After every op the real table must agree on visible columns and all
  * values; time travel to any recorded version must reproduce that
  * version's model snapshot under CURRENT column names (renames are
  * retroactive, Delta-column-mapping style); revert must un-drop columns
  * dropped later and remove columns added later.
  */
class SchemaEvolutionModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private final class MCol(
      var name: String,
      val compute: Option[Map[MCol, Double] => Double],
      val dependsOn: Set[MCol])

  test("random DDL+DML sequences: schema and data match the model at every version") {
    for (seed <- 0 until 4) {
      val rnd = new Random(7100 + seed)
      val cat = new Catalog(
        java.nio.file.Files.createTempDirectory(s"graft-sem-$seed").toString)
      val t = GraftTable.create(spark, cat, "se", Seq(
        ColumnDef("id", "bigint"), ColumnDef("v", "double")))

      val vCol = new MCol("v", None, Set.empty)
      var computed = Vector.empty[MCol] // in add order = topo order
      var rows = Map.empty[Long, Map[MCol, Double]] // values incl. v
      var nextId = 0L
      var nextColId = 0
      // version -> (visible computed cols, row values) at that version
      val snaps = mutable.SortedMap.empty[Long, (Vector[MCol], Map[Long, Map[MCol, Double]])]
      snaps(t.currentVersion) = (computed, rows)

      def evalRow(base: Map[MCol, Double], cols: Vector[MCol]): Map[MCol, Double] =
        cols.foldLeft(base)((r, c) => r + (c -> c.compute.get(r)))

      def asExpected(cols: Vector[MCol], rs: Map[Long, Map[MCol, Double]]) =
        rs.map { case (id, r) =>
          id -> (Seq("v" -> r(vCol)) ++ cols.map(c => c.name -> r(c))).toMap
        }

      def readAt(version: Option[Long]) = {
        val df = t.read(version)
        val names = df.columns.filter(_ != "id")
        df.collect().map { row =>
          row.getAs[Long]("id") -> names.map(n =>
            n -> row.getAs[Double](n)).toMap
        }.toMap
      }

      def check(tag: String): Unit = {
        assert(readAt(None) == asExpected(computed, rows),
          s"seed=$seed $tag: live image diverged")
        val vs = snaps.keys.toSeq
        val v = vs(rnd.nextInt(vs.length))
        val (pc, pr) = snaps(v)
        assert(readAt(Some(v)) == asExpected(pc, pr),
          s"seed=$seed $tag: time travel to v=$v diverged")
      }

      for (step <- 0 until 20) {
        val op = rnd.nextInt(12)
        if (op < 3 || rows.isEmpty) { // insert
          val batch = (0 until 2 + rnd.nextInt(5)).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextInt(50).toDouble)
          }
          import spark.implicits._
          val v = t.insert(batch.toDF("id", "v"))
          rows = rows ++ batch.map { case (id, x) =>
            id -> evalRow(Map(vCol -> x), computed)
          }
          snaps(v) = (computed, rows)
        } else if (op < 6) { // add a computed column over v or an earlier computed
          val target =
            if (computed.isEmpty || rnd.nextBoolean()) vCol
            else computed(rnd.nextInt(computed.length))
          val k = 2 + rnd.nextInt(2) // *2 or *3: exact in doubles
          val cadd = rnd.nextInt(2)
          val name = s"c$nextColId"; nextColId += 1
          val ver = t.addColumn(ColumnDef(name, "double",
            computedExpr = Some(s"${target.name} * $k + $cadd")))
          val col = new MCol(name, Some(r => r(target) * k + cadd),
            target.dependsOn + target)
          computed = computed :+ col
          rows = rows.view.mapValues(r => r + (col -> col.compute.get(r))).toMap
          snaps(ver) = (computed, rows)
        } else if (op < 7) { // drop a dependent-free computed column
          val free = computed.filter(c => !computed.exists(_.dependsOn(c)))
          if (free.nonEmpty) {
            val c = free(rnd.nextInt(free.length))
            val ver = t.dropColumn(c.name)
            computed = computed.filterNot(_ eq c)
            rows = rows.view.mapValues(_ - c).toMap
            snaps(ver) = (computed, rows)
          }
        } else if (op < 8) { // rename a dependent-free computed column
          val free = computed.filter(c => !computed.exists(_.dependsOn(c)))
          if (free.nonEmpty) {
            val c = free(rnd.nextInt(free.length))
            val name = s"r$nextColId"; nextColId += 1
            val ver = t.renameColumn(c.name, name)
            c.name = name // retroactive: snapshots resolve the NEW name
            snaps(ver) = (computed, rows)
          }
        } else if (op < 9) { // cascading update of the base column
          val m = 2 + rnd.nextInt(3)
          val r0 = rnd.nextInt(m)
          val ver = t.update(Map("v" -> "v + 10"), s"id % $m = $r0")
          rows = rows.map { case (id, r) =>
            id -> (if (id % m == r0)
              evalRow(Map(vCol -> (r(vCol) + 10)), computed) else r)
          }
          snaps(ver) = (computed, rows)
        } else if (op < 10) { // delete
          val m = 2 + rnd.nextInt(3)
          val r0 = rnd.nextInt(m)
          val ver = t.delete(s"id % $m = $r0")
          rows = rows.filter { case (id, _) => id % m != r0 }
          snaps(ver) = (computed, rows)
        } else if (op < 11) { // compact: layout only
          val ver = t.compact(targetFiles = 1 + rnd.nextInt(2))
          snaps(ver) = (computed, rows)
        } else { // revert: schema AND data roll back; renames stay
          val vs = snaps.keys.toSeq
          val target = vs(rnd.nextInt(vs.length))
          if (target < t.currentVersion) {
            t.revert(target)
            val (pc, pr) = snaps(target)
            computed = pc; rows = pr
            snaps.keys.filter(_ > target).toSeq.foreach(snaps.remove)
          }
        }
        check(s"step=$step")
      }
    }
  }
}
