package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `HostBlocked(host, domains)` — true when the host equals, or is a
  * subdomain of, any blocklist domain: `ads.x.tracker.com` is blocked by
  * `tracker.com` but `nottracker.com` is not (matching is on whole
  * dot-separated labels, never substrings).
  *
  * Same design argument as [[WordpieceEncodeWords]]: a production URL
  * blocklist (UT1, adult/malware feeds) runs to MILLIONS of domains, which
  * must be per-executor DATA — one hash set inside a codegen reference
  * object — not plan structure; the column-algebra equivalent
  * (`arrays_overlap(hostSuffixes(host), lit(domains))`) embeds the list in
  * the plan and stops being analyzable long before that. Per row the walk
  * probes one hash set O(labels) times with zero allocation beyond the
  * suffix views. [[graft.functions.TextFunctions.domainBlocked]] routes
  * small lists to the literal form (which an external SQL oracle can
  * restate) and big ones here; the spec pins their equality.
  */
case class HostBlocked(child: Expression, domains: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "host_blocked"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string host, got ${child.dataType.catalogString}")

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](domains.size * 2)
    domains.foreach { d =>
      val t = d.trim.toLowerCase
      if (t.nonEmpty) s.add(t)
    }
    s
  }

  def blocked(host: UTF8String): Boolean = {
    val h = host.toString
    var i = 0
    while (i <= h.length) {
      // suffix starting at each label boundary: 0, and every pos after a dot
      if (i == 0 || h.charAt(i - 1) == '.') {
        if (set.contains(if (i == 0) h else h.substring(i))) return true
      }
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any =
    blocked(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hostBlocked", this, classOf[HostBlocked].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.blocked($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
