package graft.functions

/** PDF Type 4 (PostScript calculator) functions — ISO 32000-1 §7.10.5.
  * The language is the PostScript operator subset over a numeric stack:
  * arithmetic, comparison, boolean/bitwise, stack manipulation and the
  * `if`/`ifelse` conditionals with procedure literals. Real producers
  * emit these as DeviceN/Separation tint transforms and shading
  * functions (the reference renders them via pdfium,
  * `/root/reference/pixeltable/functions/document.py:488`).
  *
  * Execution is bounded (step budget, stack cap) so a corrupt program
  * fails closed, never loops or allocates unboundedly.
  */
object PsCalc {

  sealed private trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TOp(name: String) extends Tok
  private final case class TProc(body: Vector[Tok]) extends Tok

  sealed private trait SV
  private final case class SNum(v: Double) extends SV
  private final case class SBool(v: Boolean) extends SV

  private val MaxSteps = 100000
  private val MaxStack = 256

  /** Parse `{ ... }` source (the decoded function stream) into a
    * procedure. Returns None on malformed input.
    */
  private def parse(src: String): Option[Vector[Tok]] = {
    val toks = src.replace("{", " { ").replace("}", " } ")
      .split("\\s+").filter(_.nonEmpty)
    var pos = 0
    def proc(): Option[Vector[Tok]] = {
      val out = Vector.newBuilder[Tok]
      while (pos < toks.length && toks(pos) != "}") {
        toks(pos) match {
          case "{" =>
            pos += 1
            proc() match {
              case Some(p) => out += TProc(p)
              case None => return None
            }
          case t =>
            pos += 1
            t.toDoubleOption match {
              case Some(d) => out += TNum(d)
              case None => out += TOp(t)
            }
        }
      }
      if (pos >= toks.length) return None // missing }
      pos += 1 // consume }
      Some(out.result())
    }
    if (toks.isEmpty || toks(0) != "{") return None
    pos = 1
    val p = proc()
    if (pos != toks.length) None else p
  }

  /** Compile a type-4 program to an evaluator. `nOut` outputs are the
    * TOP of the final stack in order (last output topmost, per spec).
    */
  def compile(src: String, nOut: Int): Option[Seq[Double] => Seq[Double]] = {
    val prog = parse(src).getOrElse(return None)
    Some { inputs =>
      val st = new scala.collection.mutable.ArrayBuffer[SV](16)
      inputs.foreach(v => st += SNum(v))
      var steps = 0
      def num(v: SV): Double = v match {
        case SNum(d) => d
        case SBool(b) => if (b) 1.0 else 0.0
      }
      def popN(): Double = num(pop())
      def pop(): SV = {
        require(st.nonEmpty, "type4 stack underflow")
        st.remove(st.length - 1)
      }
      def push(v: SV): Unit = {
        require(st.length < MaxStack, "type4 stack overflow")
        st += v
      }
      def toInt(d: Double): Long = d.toLong // truncation toward zero
      def run(body: Vector[Tok]): Unit = body.foreach { tok =>
        steps += 1
        require(steps <= MaxSteps, "type4 step budget exceeded")
        tok match {
          case TNum(d) => push(SNum(d))
          case TProc(_) => throw new IllegalArgumentException(
            "type4 procedure outside if/ifelse")
          case TOp(op) => op match {
            case "add" => val b = popN(); val a = popN(); push(SNum(a + b))
            case "sub" => val b = popN(); val a = popN(); push(SNum(a - b))
            case "mul" => val b = popN(); val a = popN(); push(SNum(a * b))
            case "div" => val b = popN(); val a = popN(); push(SNum(a / b))
            case "idiv" =>
              val b = toInt(popN()); val a = toInt(popN())
              require(b != 0, "idiv by zero")
              push(SNum((a / b).toDouble))
            case "mod" =>
              val b = toInt(popN()); val a = toInt(popN())
              require(b != 0, "mod by zero")
              push(SNum((a % b).toDouble))
            case "neg" => push(SNum(-popN()))
            case "abs" => push(SNum(math.abs(popN())))
            case "sqrt" => push(SNum(math.sqrt(popN())))
            case "sin" => push(SNum(math.sin(math.toRadians(popN()))))
            case "cos" => push(SNum(math.cos(math.toRadians(popN()))))
            case "atan" =>
              val den = popN(); val n0 = popN()
              val deg = math.toDegrees(math.atan2(n0, den))
              push(SNum(if (deg < 0) deg + 360 else deg))
            case "exp" => val b = popN(); val a = popN()
              push(SNum(math.pow(a, b)))
            case "ln" => push(SNum(math.log(popN())))
            case "log" => push(SNum(math.log10(popN())))
            case "ceiling" => push(SNum(math.ceil(popN())))
            case "floor" => push(SNum(math.floor(popN())))
            case "round" => push(SNum(math.floor(popN() + 0.5)))
            case "truncate" => push(SNum(toInt(popN()).toDouble))
            case "cvi" => push(SNum(toInt(popN()).toDouble))
            case "cvr" => push(SNum(popN()))
            case "true" => push(SBool(true))
            case "false" => push(SBool(false))
            case "eq" => val b = pop(); val a = pop()
              push(SBool(num(a) == num(b)))
            case "ne" => val b = pop(); val a = pop()
              push(SBool(num(a) != num(b)))
            case "gt" => val b = popN(); val a = popN(); push(SBool(a > b))
            case "ge" => val b = popN(); val a = popN(); push(SBool(a >= b))
            case "lt" => val b = popN(); val a = popN(); push(SBool(a < b))
            case "le" => val b = popN(); val a = popN(); push(SBool(a <= b))
            case "and" => (pop(), pop()) match {
              case (SBool(b), SBool(a)) => push(SBool(a && b))
              case (b, a) => push(SNum((toInt(num(a)) & toInt(num(b))).toDouble))
            }
            case "or" => (pop(), pop()) match {
              case (SBool(b), SBool(a)) => push(SBool(a || b))
              case (b, a) => push(SNum((toInt(num(a)) | toInt(num(b))).toDouble))
            }
            case "xor" => (pop(), pop()) match {
              case (SBool(b), SBool(a)) => push(SBool(a ^ b))
              case (b, a) => push(SNum((toInt(num(a)) ^ toInt(num(b))).toDouble))
            }
            case "not" => pop() match {
              case SBool(a) => push(SBool(!a))
              case a => push(SNum((~toInt(num(a))).toDouble))
            }
            case "bitshift" =>
              val sh = toInt(popN()).toInt; val a = toInt(popN())
              push(SNum((if (sh >= 0) a << sh else a >> -sh).toDouble))
            case "pop" => pop()
            case "exch" => val b = pop(); val a = pop(); push(b); push(a)
            case "dup" => val a = pop(); push(a); push(a)
            case "copy" =>
              val n = toInt(popN()).toInt
              require(n >= 0 && n <= st.length, "bad copy count")
              val from = st.length - n
              (0 until n).foreach(i => push(st(from + i)))
            case "index" =>
              val n = toInt(popN()).toInt
              require(n >= 0 && n < st.length, "bad index")
              push(st(st.length - 1 - n))
            case "roll" =>
              val j = toInt(popN()).toInt
              val n = toInt(popN()).toInt
              require(n >= 0 && n <= st.length, "bad roll count")
              if (n > 0) {
                val from = st.length - n
                val jj = ((j % n) + n) % n
                val win = st.slice(from, st.length).toVector
                val rolled = win.takeRight(jj) ++ win.dropRight(jj)
                (0 until n).foreach(i => st(from + i) = rolled(i))
              }
            case other =>
              throw new IllegalArgumentException(s"type4 operator $other")
          }
        }
      }
      // procedures participate only via if/ifelse: interpret with a
      // one-token lookahead so TProc never actually lands on the stack
      def truthy(v: SV): Boolean = v match {
        case SBool(b) => b
        case SNum(d) => d != 0.0 // lenient: spec requires a boolean
      }
      def exec(body: Vector[Tok]): Unit = {
        var i = 0
        while (i < body.length) {
          body(i) match {
            case TProc(p1) =>
              // expect: bool {p} if   |   bool {p1} {p2} ifelse
              val next = if (i + 1 < body.length) Some(body(i + 1)) else None
              next match {
                case Some(TOp("if")) =>
                  if (truthy(pop())) exec(p1)
                  i += 2
                case Some(TProc(p2)) if i + 2 < body.length &&
                  body(i + 2) == TOp("ifelse") =>
                  if (truthy(pop())) exec(p1) else exec(p2)
                  i += 3
                case _ => throw new IllegalArgumentException(
                  "type4 procedure without if/ifelse")
              }
            case t =>
              run(Vector(t))
              i += 1
          }
        }
      }
      exec(prog)
      require(st.length >= nOut, "type4 produced too few outputs")
      st.takeRight(nOut).map(num).toSeq
    }
  }
}
