package graft.serve

/** The reference's real model forward pass (U1), re-implemented as
  * deterministic double-precision Scala linear algebra — closing the one
  * parity gap the surrogate left open.
  *
  * Architecture (reference `Crypto-TS-Model-master/src/lstm_model.py:16-44`):
  *
  *   input_net : Linear(F→H) → GELU → LayerNorm(H) → Dropout(identity at eval)
  *   lstm      : LSTM(H→H), 1 layer, batch_first
  *   head      : last timestep → Linear(H→H) → LayerNorm(H) → GELU → Linear(H→P)
  *
  * Everything here is the inference-time semantics of that stack; the
  * reference's seq_len/d_model are config, so the fixture uses tiny dims
  * (F=2 features, H=4 hidden, S=8 steps, P=3 horizons) — small enough
  * that a SQL oracle can replay the recurrence fully unrolled, the same
  * discipline used for the Lloyd rounds in the trained-IVF oracle.
  *
  * Determinism/oracle-parity rules:
  *  - Weights are Lehmer-LCG ints quantized to k/1024 — exact dyadic
  *    doubles, emitted into the SQL as `(k/1024.0)` so both engines
  *    compute from bit-identical constants.
  *  - GELU is the published tanh approximation
  *    0.5·x·(1+tanh(√(2/π)·(x+0.044715·x³))) with the √(2/π) literal
  *    shared by both sides (PyTorch's `approximate='tanh'` form — the
  *    erf form has no portable SQL twin).
  *  - Every reduction (dot products, LayerNorm mean/var) is a pinned
  *    left-to-right fold, mirrored exactly in the generated SQL.
  *  - Final predictions are ROUND(·, 6)+0.0 on both sides: libm-vs-JVM
  *    exp/tanh disagree by ≲1 ulp, which the rounding absorbs.
  *
  * The gate layout follows the PyTorch convention: rows [0,H) input gate,
  * [H,2H) forget, [2H,3H) cell candidate, [3H,4H) output;
  * c_t = f⊙c_{t−1} + i⊙g, h_t = o⊙tanh(c_t).
  */
object LstmForward {

  val F = 2 // features per step: scaled value + first difference
  val H = 4 // hidden width
  val S = 8 // window length (seq_len)
  val P = 3 // prediction horizons (pred_len)

  private val GeluC = 0.7978845608028654 // sqrt(2/pi), shared literal
  private val Eps = 1e-5                 // LayerNorm eps (PyTorch default)

  // ---- fixture weights: one Lehmer stream, consumed in declaration order ----

  private val Mod = 2147483647L
  private val Seed = 12345L

  private def intStream(n: Int, skip: Int): Array[Int] = {
    var x = Seed
    var i = 0
    while (i < skip) { x = x * 48271L % Mod; i += 1 }
    Array.fill(n) { x = x * 48271L % Mod; ((x % 1025L) - 512L).toInt }
  }

  private var cursor = 0
  private def ints(n: Int): Array[Int] = {
    val out = intStream(n, cursor); cursor += n; out
  }

  // integer weight units; double value = k/1024 (gamma = (1024+k)/1024)
  private[serve] val w1k = ints(H * F)
  private[serve] val b1k = ints(H)
  private[serve] val gm1k = ints(H)
  private[serve] val bt1k = ints(H)
  private[serve] val wihk = ints(4 * H * H)
  private[serve] val whhk = ints(4 * H * H)
  private[serve] val bihk = ints(4 * H)
  private[serve] val bhhk = ints(4 * H)
  private[serve] val w2k = ints(H * H)
  private[serve] val b2k = ints(H)
  private[serve] val gm2k = ints(H)
  private[serve] val bt2k = ints(H)
  private[serve] val w3k = ints(P * H)
  private[serve] val b3k = ints(P)

  @inline private def d(k: Int): Double = k / 1024.0
  @inline private def gd(k: Int): Double = (1024 + k) / 1024.0

  // ---- forward pass ----

  /** tanh composed from exp — NOT `math.tanh`: the oracle engine
    * (DuckDB 1.0) ships no hyperbolic functions, so both sides compute
    * the identical composition 1 − 2/(e^{2x}+1) (saturates correctly:
    * exp overflow → +1, underflow → −1; agreement is then down to exp
    * ulps, absorbed by the final ROUND).
    */
  @inline private def tanhc(x: Double): Double =
    1.0 - 2.0 / (math.exp(x + x) + 1.0)

  @inline private def gelu(x: Double): Double =
    0.5 * x * (1.0 + tanhc(GeluC * (x + 0.044715 * ((x * x) * x))))

  @inline private def sigmoid(x: Double): Double =
    1.0 / (1.0 + math.exp(-x))

  private def layerNorm(g: Array[Double], gmk: Array[Int],
      btk: Array[Int]): Array[Double] = {
    var s = 0.0
    var j = 0
    while (j < H) { s = s + g(j); j += 1 }
    val m = s / 4.0
    var v = 0.0
    j = 0
    while (j < H) { v = v + (g(j) - m) * (g(j) - m); j += 1 }
    val den = math.sqrt(v / 4.0 + Eps)
    Array.tabulate(H)(j => ((g(j) - m) / den) * gd(gmk(j)) + d(btk(j)))
  }

  /** seqLen raw window values (ascending time) → P predictions. */
  def forward(window: Seq[Double]): Seq[Double] = {
    require(window.length == S, s"window must have $S values, got ${window.length}")
    val w = window.toArray
    var vmin = w(0); var vmax = w(0)
    var t = 1
    while (t < S) {
      if (w(t) < vmin) vmin = w(t)
      if (w(t) > vmax) vmax = w(t)
      t += 1
    }
    val a = Array.tabulate(S)(t => (w(t) - vmin) / ((vmax - vmin) + 1e-9))
    val h = new Array[Double](H)
    val c = new Array[Double](H)
    t = 0
    while (t < S) {
      val feat0 = a(t)
      val feat1 = if (t == 0) 0.0 else a(t) - a(t - 1)
      // input_net
      val p = Array.tabulate(H) { j =>
        d(b1k(j)) + d(w1k(j * F)) * feat0 + d(w1k(j * F + 1)) * feat1
      }
      val g = p.map(gelu)
      val xin = layerNorm(g, gm1k, bt1k)
      // LSTM cell
      val pre = Array.tabulate(4 * H) { j =>
        var acc = d(bihk(j) + bhhk(j))
        var k = 0
        while (k < H) { acc = acc + d(wihk(j * H + k)) * xin(k); k += 1 }
        k = 0
        while (k < H) { acc = acc + d(whhk(j * H + k)) * h(k); k += 1 }
        acc
      }
      var j = 0
      while (j < H) {
        val ig = sigmoid(pre(j))
        val fg = sigmoid(pre(H + j))
        val gg = tanhc(pre(2 * H + j))
        val og = sigmoid(pre(3 * H + j))
        c(j) = fg * c(j) + ig * gg
        h(j) = og * tanhc(c(j))
        j += 1
      }
      t += 1
    }
    // head
    val q = Array.tabulate(H) { j =>
      var acc = d(b2k(j))
      var k = 0
      while (k < H) { acc = acc + d(w2k(j * H + k)) * h(k); k += 1 }
      acc
    }
    val r = layerNorm(q, gm2k, bt2k).map(gelu)
    Array.tabulate(P) { j =>
      var acc = d(b3k(j))
      var k = 0
      while (k < H) { acc = acc + d(w3k(j * H + k)) * r(k); k += 1 }
      acc
    }.toSeq
  }

  // ---- oracle: the recurrence unrolled as generated DuckDB SQL ----

  private def kLit(k: Int): String = s"($k/1024.0)"
  private def gmLit(k: Int): String = s"(${1024 + k}/1024.0)"
  // same exp-composition as tanhc (DuckDB 1.0 has no tanh builtin)
  private def tanhSql(x: String): String =
    s"(1.0 - 2.0 / (exp(($x) + ($x)) + 1.0))"
  private def geluSql(x: String): String =
    s"0.5 * $x * (1.0 + ${tanhSql(s"$GeluC * ($x + 0.044715 * (($x * $x) * $x))")})"
  private def sigSql(x: String): String = s"(1.0 / (1.0 + exp(-($x))))"

  /** Full oracle SQL over the `events` table: per event_type, latest S
    * values (ordered by ts, event_id) → unrolled forward → one row per
    * horizon. Generated, not hand-written — every weight literal and
    * fold order comes from the same arrays `forward` uses.
    */
  def oracleSql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH s AS (SELECT event_type, MAX(ts) AS last_ts,
              |    list(value ORDER BY ts, event_id) AS vs
              |  FROM events GROUP BY 1),
              |tl AS (SELECT event_type, last_ts, vs[len(vs)-${S - 1}:] AS tail
              |  FROM s WHERE len(vs) >= $S),
              |r0 AS (SELECT event_type, last_ts, ${(1 to S)
                 .map(t => s"tail[$t] AS v$t").mkString(", ")} FROM tl),
              |r1 AS (SELECT *, LEAST(${(1 to S).map("v" + _).mkString(", ")}) AS vmin,
              |  GREATEST(${(1 to S).map("v" + _).mkString(", ")}) AS vmax FROM r0),
              |f0 AS (SELECT event_type, last_ts, ${(1 to S)
                 .map(t => s"(v$t - vmin) / ((vmax - vmin) + 1e-9) AS a$t")
                 .mkString(", ")} FROM r1),
              |f1 AS (SELECT *, 0.0 AS d1, ${(2 to S)
                 .map(t => s"a$t - a${t - 1} AS d$t").mkString(", ")} FROM f0)""".stripMargin
    for (t <- 1 to S) {
      // input_net: Linear -> GELU -> LayerNorm
      val p = (0 until H).map { j =>
        s"(${kLit(b1k(j))} + ${kLit(w1k(j * F))} * a$t + ${kLit(w1k(j * F + 1))} * d$t) AS p${t}_$j"
      }
      sb ++= s",\np$t AS (SELECT *, ${p.mkString(", ")} FROM ${if (t == 1) "f1" else s"st${t - 1}"})"
      val g = (0 until H).map(j => s"${geluSql(s"p${t}_$j")} AS g${t}_$j")
      sb ++= s",\ng$t AS (SELECT *, ${g.mkString(", ")} FROM p$t)"
      sb ++= s",\nm$t AS (SELECT *, (${(0 until H).map(j => s"g${t}_$j")
        .mkString(" + ")}) / 4.0 AS mu$t FROM g$t)"
      sb ++= s",\nw$t AS (SELECT *, (${(0 until H)
        .map(j => s"(g${t}_$j - mu$t) * (g${t}_$j - mu$t)")
        .mkString(" + ")}) / 4.0 AS vr$t FROM m$t)"
      val xin = (0 until H).map { j =>
        s"((g${t}_$j - mu$t) / sqrt(vr$t + $Eps)) * ${gmLit(gm1k(j))} + ${kLit(bt1k(j))} AS x${t}_$j"
      }
      sb ++= s",\nx$t AS (SELECT *, ${xin.mkString(", ")} FROM w$t)"
      // LSTM cell: pre-activations, gates, state
      def hRef(k: Int): String = if (t == 1) "0.0" else s"h${t - 1}_$k"
      def cRef(k: Int): String = if (t == 1) "0.0" else s"c${t - 1}_$k"
      val pre = (0 until 4 * H).map { j =>
        val terms = new StringBuilder(kLit(bihk(j) + bhhk(j)))
        for (k <- 0 until H) terms ++= s" + ${kLit(wihk(j * H + k))} * x${t}_$k"
        for (k <- 0 until H) terms ++= s" + ${kLit(whhk(j * H + k))} * ${hRef(k)}"
        s"($terms) AS z${t}_$j"
      }
      sb ++= s",\nz$t AS (SELECT *, ${pre.mkString(", ")} FROM x$t)"
      val gates = (0 until H).flatMap { j =>
        Seq(s"${sigSql(s"z${t}_$j")} AS i${t}_$j",
          s"${sigSql(s"z${t}_${H + j}")} AS f${t}_$j",
          s"${tanhSql(s"z${t}_${2 * H + j}")} AS cg${t}_$j",
          s"${sigSql(s"z${t}_${3 * H + j}")} AS o${t}_$j")
      }
      sb ++= s",\ngt$t AS (SELECT *, ${gates.mkString(", ")} FROM z$t)"
      val cs = (0 until H).map(j =>
        s"f${t}_$j * ${cRef(j)} + i${t}_$j * cg${t}_$j AS c${t}_$j")
      sb ++= s",\nct$t AS (SELECT *, ${cs.mkString(", ")} FROM gt$t)"
      val hs = (0 until H).map(j =>
        s"o${t}_$j * ${tanhSql(s"c${t}_$j")} AS h${t}_$j")
      sb ++= s",\nst$t AS (SELECT *, ${hs.mkString(", ")} FROM ct$t)"
    }
    // head: Linear -> LayerNorm -> GELU -> Linear
    val q = (0 until H).map { j =>
      val terms = new StringBuilder(kLit(b2k(j)))
      for (k <- 0 until H) terms ++= s" + ${kLit(w2k(j * H + k))} * h${S}_$k"
      s"($terms) AS q_$j"
    }
    sb ++= s",\nhq AS (SELECT *, ${q.mkString(", ")} FROM st$S)"
    sb ++= s",\nhm AS (SELECT *, (${(0 until H).map(j => s"q_$j")
      .mkString(" + ")}) / 4.0 AS qmu FROM hq)"
    sb ++= s",\nhv AS (SELECT *, (${(0 until H)
      .map(j => s"(q_$j - qmu) * (q_$j - qmu)").mkString(" + ")}) / 4.0 AS qvr FROM hm)"
    val ln = (0 until H).map { j =>
      s"((q_$j - qmu) / sqrt(qvr + $Eps)) * ${gmLit(gm2k(j))} + ${kLit(bt2k(j))} AS l_$j"
    }
    sb ++= s",\nhl AS (SELECT *, ${ln.mkString(", ")} FROM hv)"
    val r = (0 until H).map(j => s"${geluSql(s"l_$j")} AS r_$j")
    sb ++= s",\nhr AS (SELECT *, ${r.mkString(", ")} FROM hl)"
    val y = (0 until P).map { j =>
      val terms = new StringBuilder(kLit(b3k(j)))
      for (k <- 0 until H) terms ++= s" + ${kLit(w3k(j * H + k))} * r_$k"
      s"($terms) AS y_$j"
    }
    sb ++= s",\nhy AS (SELECT event_type, last_ts, ${y.mkString(", ")} FROM hr)"
    sb ++= s"""\nSELECT event_type, hz.horizon,
              |  last_ts + hz.horizon * INTERVAL 300 SECOND AS target_ts,
              |  ROUND(CASE hz.horizon ${(1 to P)
                 .map(j => s"WHEN $j THEN y_${j - 1}").mkString(" ")}
              |    END, 6) + 0.0 AS prediction
              |FROM hy, (SELECT unnest(range(1, ${P + 1})) AS horizon) hz
              |ORDER BY event_type, hz.horizon""".stripMargin
    sb.toString
  }
}
