package graft

import org.apache.spark.sql.functions._

import graft.functions.Fernet

/** Fernet crypto (the Crypt filter's engine, reference filter/crypt.go:26-148). */
class FernetSpec extends SparkSpec {

  private val key = Fernet.keyFromPassphrase("spec-key")

  test("roundtrip: decrypt(encrypt(x)) == x") {
    val k = Fernet.decodeKey(key)
    val pt = "hello graft".getBytes("UTF-8")
    val iv = Array.tabulate[Byte](16)(_.toByte)
    val token = Fernet.encrypt(k, pt, iv, 1700000000L)
    assert(Fernet.decrypt(k, token).map(new String(_, "UTF-8")).contains("hello graft"))
  }

  test("tampered token → None; wrong key → None; garbage → None") {
    val k = Fernet.decodeKey(key)
    val token = Fernet.encrypt(k, "x".getBytes, new Array[Byte](16), 0L)
    val bad = token.dropRight(4) + "AAAA"
    assert(Fernet.decrypt(k, bad).isEmpty)
    val k2 = Fernet.decodeKey(Fernet.keyFromPassphrase("other"))
    assert(Fernet.decrypt(k2, token).isEmpty)
    assert(Fernet.decrypt(k, "not-a-token").isEmpty)
  }

  test("TTL: expired token → None, fresh token → Some") {
    val k = Fernet.decodeKey(key)
    val token = Fernet.encrypt(k, "x".getBytes, new Array[Byte](16), 1000L)
    assert(Fernet.decrypt(k, token, ttlSec = 60, nowSec = 2000L).isEmpty)
    assert(Fernet.decrypt(k, token, ttlSec = 60, nowSec = 1030L).isDefined)
  }

  test("column roundtrip preserves values, null passes through") {
    val df = strDf(Seq("v"), Seq(Seq("secret-1"), Seq("secret-2"), Seq(null)))
    val enc = Fernet.encryptCol(key)
    val dec = Fernet.decryptCol(key)
    val out = df.withColumn("back", dec(enc(col("v"))))
    assert(out.filter(col("back") === col("v")).count() == 2)
    assert(out.filter(col("v").isNull && col("back").isNull).count() == 1)
  }

  test("encryptCol is non-deterministic: equal plaintexts → distinct tokens") {
    val df = strDf(Seq("v"), Seq(Seq("same"), Seq("same"), Seq("same")))
    val toks = df.withColumn("t", Fernet.encryptCol(key)(col("v")))
      .select("t").collect().map(_.getString(0))
    assert(toks.distinct.length == 3, "random-IV fernet must never repeat tokens")
    // while the deterministic test helper is stable by design
    val dtoks = df.withColumn("t", Fernet.encryptColDeterministic(key)(col("v")))
      .select("t").collect().map(_.getString(0))
    assert(dtoks.distinct.length == 1)
  }

  test("decrypt column yields null on forged input (callers drop the row)") {
    val df = strDf(Seq("v"), Seq(Seq("forged")))
    val out = df.withColumn("d", Fernet.decryptCol(key)(col("v")))
    assert(out.select("d").head().isNullAt(0))
  }

  test("key must be 32 bytes") {
    assertThrows[IllegalArgumentException](Fernet.decodeKey("dG9vc2hvcnQ"))
  }
}
