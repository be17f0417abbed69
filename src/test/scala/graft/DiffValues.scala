package graft

/** Canonical value model + cell comparator shared by the differential
  * harnesses (FuzzSpec's grammar fuzz, SuiteReplaySpec's reference-suite
  * replay): Spark collect() values and the reference engine's JSON rows
  * both normalize to V, compared with float tolerance and an opt-in
  * bridge for engines that render JSON as text where the other returns
  * the typed structure.
  */
object DiffValues {

  sealed trait V
  case object VNull extends V
  case class VNum(d: Double) extends V
  case class VStr(s: String) extends V
  case class VBool(b: Boolean) extends V
  case class VArr(items: Seq[V]) extends V
  case class VObj(fields: Map[String, V]) extends V

  def norm(a: Any): V = a match {
    case null => VNull
    case b: Boolean => VBool(b)
    case b: java.lang.Boolean => VBool(b)
    case s: String => VStr(s)
    case n: java.math.BigDecimal => VNum(n.doubleValue())
    case n: BigDecimal => VNum(n.toDouble)
    case n: Number => VNum(n.doubleValue())
    // scala.collection.Seq: Spark collects arrays as mutable.ArraySeq,
    // which the 2.13 default (immutable) Seq alias does NOT match
    case s: scala.collection.Seq[_] => VArr(s.toSeq.map(norm))
    case s: Array[_] => VArr(s.toSeq.map(norm))
    case m: scala.collection.Map[_, _] =>
      VObj(m.map { case (k, v) => String.valueOf(k) -> norm(v) }.toMap)
    case r: org.apache.spark.sql.Row => VArr(r.toSeq.map(norm))
    case other => VStr(other.toString)
  }

  /** Normalize a Jackson node (the reference's JSON output) to V. */
  def jnorm(n: com.fasterxml.jackson.databind.JsonNode): V =
    if (n == null || n.isNull) VNull
    else if (n.isBoolean) VBool(n.asBoolean())
    else if (n.isNumber) VNum(n.asDouble())
    else if (n.isArray) VArr((0 until n.size()).map(i => jnorm(n.get(i))))
    else if (n.isObject) {
      val it = n.fieldNames()
      val m = scala.collection.mutable.Map[String, V]()
      while (it.hasNext) { val f = it.next(); m += f -> jnorm(n.get(f)) }
      VObj(m.toMap)
    }
    else VStr(n.asText())

  /** Parse a JSON text to the canonical value model (for bridging a
    * textual-JSON engine result against the reference's typed one).
    */
  def parseJsonV(s: String): Option[V] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      Some(jnorm(om.readTree(s)))
    } catch { case _: Exception => None }

  /** Parse either engine's timestamp/date rendering to an epoch-millis
    * instant: Spark's "2024-01-15 00:00:00[.S]" / "2024-01-15" vs the
    * reference's JSON-serialized Date "2024-01-15T00:00:00.000Z".
    * Bare strings are read as UTC (both harness processes run TZ=UTC).
    */
  def parseInstant(s: String): Option[Long] = {
    val t = s.trim
    def toMs(text: String, patterns: Seq[String]): Option[Long] =
      patterns.view.flatMap { p =>
        try {
          val f = new java.text.SimpleDateFormat(p)
          f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          f.setLenient(false)
          Some(f.parse(text).getTime)
        } catch { case _: Exception => None }
      }.headOption
    if (t.length < 8 || !t.take(4).forall(_.isDigit)) None
    else toMs(t.replace("T", " ").stripSuffix("Z"), Seq(
      "yyyy-MM-dd HH:mm:ss.SSS", "yyyy-MM-dd HH:mm:ss.S",
      "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd"))
  }

  /** jsonBridge: one engine returns JSON TEXT where the other returns
    * the typed structure (Spark's get_json_object is textual; the
    * reference's JSON_EXTRACT is typed). tsBridge: equality of
    * timestamp/date strings modulo rendering (ISO-Z vs Spark). Both stay
    * opt-in per battery so genuine divergences elsewhere still flag.
    */
  def vEq(a: V, b: V, jsonBridge: Boolean = false, tsBridge: Boolean = false): Boolean = (a, b) match {
    case (VNull, VNull) => true
    case (VNum(x), VNum(y)) =>
      (x.isNaN && y.isNaN) ||
        math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (VArr(x), VArr(y)) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => vEq(u, v, jsonBridge, tsBridge) }
    case (VObj(x), VObj(y)) =>
      x.keySet == y.keySet && x.keys.forall(k => vEq(x(k), y(k), jsonBridge, tsBridge))
    // exact string equality FIRST: the bridges below must only fire on
    // pairs that do not already agree textually
    case (VStr(s), VStr(t)) =>
      s == t || (tsBridge && (for { u <- parseInstant(s); v <- parseInstant(t) } yield u == v).getOrElse(false))
    case (VStr(s), other: VArr) => parseJsonV(s).exists(vEq(_, other, jsonBridge, tsBridge))
    case (other: VArr, VStr(s)) => parseJsonV(s).exists(vEq(other, _, jsonBridge, tsBridge))
    case (VStr(s), other: VObj) => parseJsonV(s).exists(vEq(_, other, jsonBridge, tsBridge))
    case (other: VObj, VStr(s)) => parseJsonV(s).exists(vEq(other, _, jsonBridge, tsBridge))
    case (VStr(s), other) if jsonBridge => parseJsonV(s).exists(vEq(_, other, jsonBridge, tsBridge))
    case (other, VStr(s)) if jsonBridge => parseJsonV(s).exists(vEq(other, _, jsonBridge, tsBridge))
    case (x, y) => x == y
  }
}
