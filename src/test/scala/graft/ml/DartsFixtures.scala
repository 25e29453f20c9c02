package graft.ml

/** Test-side builder for sentencepiece `precompiled_charsmap` blobs in the
  * exact darts-clone double-array layout [[PrecompiledCharsMap]] traverses:
  * label in the low 8 bits (+bit31 mask), has_leaf at bit 8, offset stored
  * at bits 10+, children of a node at position p with base b = p ^ offset
  * sitting at b ^ c, terminal value unit at b ^ 0. Bases are unique across
  * nodes (as in real darts) so no two nodes' transitions alias.
  */
object DartsFixtures {

  private final class TNode {
    val ch = scala.collection.mutable.TreeMap.empty[Int, TNode]
    var value: Option[Int] = None
  }

  def buildDarts(keys: Seq[(Array[Byte], Int)]): Array[Int] = {
    val root = new TNode
    keys.foreach { case (k, v) =>
      var n = root
      k.foreach { b => n = n.ch.getOrElseUpdate(b & 0xff, new TNode) }
      n.value = Some(v)
    }
    val units = scala.collection.mutable.ArrayBuffer[Int](0)
    val used = scala.collection.mutable.BitSet(0)
    val usedBases = scala.collection.mutable.BitSet()
    def ensure(i: Int): Unit = while (units.length <= i) units += 0
    def place(n: TNode, pos: Int, ownLabel: Int): Unit = {
      val labels = (if (n.value.isDefined) Seq(0) else Seq.empty) ++ n.ch.keys
      if (labels.isEmpty) { units(pos) = ownLabel; return }
      var b = 1
      while (usedBases(b) || labels.exists(c => used(b ^ c))) b += 1
      usedBases += b
      labels.foreach { c => used += (b ^ c); ensure(b ^ c) }
      units(pos) = ((pos ^ b) << 10) |
        (if (n.value.isDefined) 0x100 else 0) | ownLabel
      n.value.foreach(v => units(b) = 0x80000000 | v)
      n.ch.foreach { case (c, child) => place(child, b ^ c, c) }
    }
    place(root, 0, 0)
    units.toArray
  }

  /** full charsmap blob: LE trie size | LE units | NUL-terminated pool */
  def charsmapBlob(mappings: Seq[(String, String)]): Array[Byte] = {
    val pool = new java.io.ByteArrayOutputStream()
    val keys = mappings.map { case (k, repl) =>
      val off = pool.size()
      pool.write(repl.getBytes("UTF-8")); pool.write(0)
      (k.getBytes("UTF-8"), off)
    }
    val units = buildDarts(keys)
    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int): Unit = {
      out.write(i & 0xff); out.write((i >>> 8) & 0xff)
      out.write((i >>> 16) & 0xff); out.write((i >>> 24) & 0xff)
    }
    le(units.length * 4)
    units.foreach(le)
    out.write(pool.toByteArray)
    out.toByteArray
  }
}
