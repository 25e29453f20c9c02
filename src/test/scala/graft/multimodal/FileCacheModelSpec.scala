package graft.multimodal

import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized testing: drive the real FileCache with random
  * op sequences (add / re-add / lookup / miss / setCapacity) under
  * lease = 0 and check, after EVERY op, that its accounting matches a
  * trivially-correct in-memory LRU model — the same state-machine idea
  * the reference test encodes by hand, generalized to arbitrary
  * interleavings. Deterministic seeds so failures replay.
  */
class FileCacheModelSpec extends AnyFunSuite {

  /** the oracle: an ordered map url -> size, evicting oldest-first */
  private final class Model(var capacity: Long) {
    val lru = mutable.LinkedHashMap.empty[String, Long]
    var evictions = 0
    def totalSize: Long = lru.valuesIterator.sum
    private def shrink(extra: Long): Unit =
      while (totalSize + extra > capacity && lru.nonEmpty) {
        lru.remove(lru.head._1)
        evictions += 1
      }
    def add(url: String, size: Long): Unit = lru.get(url) match {
      case Some(_) => val v = lru.remove(url).get; lru.put(url, v) // refresh
      case None    => shrink(size); lru.put(url, size)
    }
    def lookup(url: String): Boolean = lru.get(url) match {
      case Some(v) => lru.remove(url); lru.put(url, v); true
      case None    => false
    }
    def setCapacity(c: Long): Unit = { capacity = c; shrink(0) }
  }

  private def mkTemp(dir: Path, size: Int): Path = {
    val p = Files.createTempFile(dir, "obj", ".bin")
    Files.write(p, Array.fill[Byte](size)(7))
    p
  }

  test("random op sequences: real cache accounting == LRU model, every step") {
    for (seed <- 0 until 12) {
      val rnd = new Random(seed)
      val cacheDir = Files.createTempDirectory(s"graft-fcm-$seed")
      val tmpDir = Files.createTempDirectory(s"graft-fcm-dl-$seed")
      val fc = new FileCache(cacheDir.toString)
      fc.setLeaseSeconds(0)
      val cap = 4000L + rnd.nextInt(4000)
      fc.setCapacity(cap)
      val model = new Model(cap)
      val urls = (0 until 12).map(i => s"https://h/o$i")
      val sizes = urls.map(_ => 300L + rnd.nextInt(900))

      for (step <- 0 until 60) {
        rnd.nextInt(10) match {
          case n if n < 5 => // retrieve (miss → download+add, hit → lookup)
            val i = rnd.nextInt(urls.length)
            fc.lookup(urls(i)) match {
              case Some(_) => model.lookup(urls(i))
              case None =>
                fc.add("ab" * 16, 0, urls(i), mkTemp(tmpDir, sizes(i).toInt))
                model.add(urls(i), sizes(i))
            }
          case n if n < 7 => // blind lookup (may miss)
            val i = rnd.nextInt(urls.length)
            assert(fc.lookup(urls(i)).isDefined == model.lookup(urls(i)),
              s"seed=$seed step=$step hit/miss diverged on ${urls(i)}")
          case n if n < 9 => // redundant concurrent-download add
            val i = rnd.nextInt(urls.length)
            fc.add("ab" * 16, 0, urls(i), mkTemp(tmpDir, sizes(i).toInt))
            model.add(urls(i), sizes(i))
          case _ => // capacity change (shrink or grow)
            val c = 2500L + rnd.nextInt(6000)
            fc.setCapacity(c)
            model.setCapacity(c)
        }
        assert(fc.totalSize == model.totalSize,
          s"seed=$seed step=$step size ${fc.totalSize} != ${model.totalSize}")
        assert(fc.numFiles() == model.lru.size,
          s"seed=$seed step=$step files ${fc.numFiles()} != ${model.lru.size}")
        assert(fc.numEvictions == model.evictions,
          s"seed=$seed step=$step evictions ${fc.numEvictions} != ${model.evictions}")
      }
      // LRU order itself matches: evict down to one survivor — it must be
      // the model's most-recently-used entry
      if (model.lru.nonEmpty) {
        val mru = model.lru.last._1
        val mruSize = model.lru.last._2
        fc.setCapacity(mruSize)
        model.setCapacity(mruSize)
        assert(fc.numFiles() == model.lru.size)
        if (model.lru.size == 1)
          assert(fc.lookup(mru).isDefined, s"seed=$seed: wrong LRU survivor")
      }
      fc.validate()
    }
  }
}
