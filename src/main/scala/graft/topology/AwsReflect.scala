package graft.topology

/** Reflection utilities for the optional real-AWS connector seams
  * (DynamoDB/SQS/Kinesis `Client = "aws"`). The AWS SDK v2 is NOT a
  * dependency of this build — connectors construct clients and requests
  * reflectively so the library compiles and tests without the SDK, and a
  * cluster that ships the SDK jars gets the real network path. Selecting
  * an AWS client without the jars fails fast with guidance.
  *
  * The SDK's fluent builder convention (X.builder() … .build()) is regular
  * enough that one generic invoker covers every request type.
  */
private[graft] object AwsReflect {

  def cls(n: String): Class[_] =
    try Class.forName(n)
    catch {
      case e: ClassNotFoundException => throw new IllegalStateException(
        "Client=\"aws\" needs the AWS SDK v2 jars on the classpath " +
          s"(missing $n); this build ships without them — use the local " +
          "double or add the SDK to the cluster", e)
    }

  /** Find a 1-arg method by name accepting the given value (boxing-aware). */
  private def method1(target: AnyRef, name: String, arg: AnyRef)
      : java.lang.reflect.Method = {
    val cands = target.getClass.getMethods.filter(m =>
      m.getName == name && m.getParameterCount == 1)
    cands.find { m =>
      val p = m.getParameterTypes()(0)
      p.isInstance(arg) ||
        (p == classOf[Int] && arg.isInstanceOf[java.lang.Integer]) ||
        (p == classOf[Long] && arg.isInstanceOf[java.lang.Long]) ||
        (p == classOf[Boolean] && arg.isInstanceOf[java.lang.Boolean])
    }.getOrElse(throw new NoSuchMethodException(
      s"${target.getClass.getName}.$name(${arg.getClass.getName})"))
  }

  /** `build("...FooRequest", "bar" -> v, ...)` = FooRequest.builder().bar(v)….build() */
  def build(className: String, props: (String, AnyRef)*): AnyRef = {
    val b = cls(className).getMethod("builder").invoke(null)
    props.foreach { case (name, v) => method1(b, name, v).invoke(b, v) }
    b.getClass.getMethod("build").invoke(b).asInstanceOf[AnyRef]
  }

  /** Invoke a 0-arg or 1-arg method by name (for client calls + getters). */
  def call(target: AnyRef, name: String, args: AnyRef*): AnyRef = args match {
    case Seq() =>
      target.getClass.getMethod(name).invoke(target).asInstanceOf[AnyRef]
    case Seq(a) => method1(target, name, a).invoke(target, a).asInstanceOf[AnyRef]
    case _ => throw new IllegalArgumentException("call supports 0 or 1 args")
  }

  /** `client("...SqsClient", region)` = SqsClient.builder().region(Region.of(r)).build() */
  def client(className: String, region: String): AnyRef = {
    val regionCls = cls("software.amazon.awssdk.regions.Region")
    val regionObj = regionCls.getMethod("of", classOf[String]).invoke(null, region)
    val b = cls(className).getMethod("builder").invoke(null)
    b.getClass.getMethod("region", regionCls).invoke(b, regionObj)
    b.getClass.getMethod("build").invoke(b).asInstanceOf[AnyRef]
  }

  def close(c: AnyRef): Unit = c.getClass.getMethod("close").invoke(c)
}
