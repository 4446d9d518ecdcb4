package graft

import java.io.File
import java.nio.file.Files

import graft.topology.{Topology, WebSocketOutput}

/** SQLite (JDBC, Derby-backed in this zero-egress build) and WebSocket
  * output sinks. reference: output/sqlite.go, output/websocket.go.
  */
class SqliteWebSocketSpec extends SparkSpec {

  private def tmpDir(): File = Files.createTempDirectory("graft-sqlw").toFile

  private def writeCsv(dir: File, name: String, content: String): File = {
    val f = new File(dir, name)
    Files.writeString(f.toPath, content)
    f
  }

  private def queryDb(path: String, sql: String): Seq[Seq[String]] = {
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$path")
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val out = Seq.newBuilder[Seq[String]]
      while (rs.next()) out += (1 to n).map(i => Option(rs.getString(i)).getOrElse(""))
      out.result()
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$path;shutdown=true").close()
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("SQLite output: fields as columns, PreRun/PostRun, Clear, per-shard path") {
    val dir = tmpDir()
    writeCsv(dir, "in.csv", "1,a,x\n2,b,y\n3,c,z\n")
    val db = s"$dir/out/db"
    val toml =
      s"""[fields]
         |names = ["id", "name", "tag"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "SQLite"
         |fields = ["id", "name"]
         |  [output.config]
         |  PathString = "$db"
         |  TableName = "recs"
         |  JdbcUrlTemplate = "jdbc:derby:{{.Path}};create=true"
         |  Clear = true
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    assert(result.rows == 3L)
    assert(result.paths == Seq(db))
    val rows = queryDb(db, "SELECT id, name FROM recs ORDER BY id")
    assert(rows == Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
  }

  test("SQLite Clear truncates an existing table instead of appending") {
    val dir = tmpDir()
    writeCsv(dir, "in.csv", "1,a\n2,b\n")
    val db = s"$dir/db"
    def toml(clear: Boolean) =
      s"""[fields]
         |names = ["id", "name"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "SQLite"
         |fields = ["id", "name"]
         |  [output.config]
         |  PathString = "$db"
         |  TableName = "recs"
         |  JdbcUrlTemplate = "jdbc:derby:{{.Path}};create=true"
         |  Clear = $clear
         |""".stripMargin
    Topology.compileToml(spark, toml(clear = false)).run()
    Topology.compileToml(spark, toml(clear = false)).run() // appends → 4 rows
    assert(queryDb(db, "SELECT count(*) FROM recs").head.head == "4")
    Topology.compileToml(spark, toml(clear = true)).run() // truncates → 2 rows
    assert(queryDb(db, "SELECT count(*) FROM recs").head.head == "2")
  }

  test("SQLiteRaw stores the serialized record blob alongside the fields") {
    val dir = tmpDir()
    writeCsv(dir, "in.csv", "1,a,x\n2,b,y\n")
    val db = s"$dir/raw"
    val toml =
      s"""[fields]
         |names = ["id", "name", "tag"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "SQLiteRaw"
         |fields = ["id"]
         |  [output.config]
         |  PathString = "$db"
         |  TableName = "recs"
         |  RecordBlobName = "rawline"
         |  JdbcUrlTemplate = "jdbc:derby:{{.Path}};create=true"
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    assert(result.rows == 2L)
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db")
    val raws =
      try {
        val rs = conn.createStatement().executeQuery("SELECT id, rawline FROM recs")
        val out = Seq.newBuilder[(String, String)]
        while (rs.next()) out += ((rs.getString(1), new String(rs.getBytes(2), "UTF-8")))
        out.result().sortBy(_._1)
      } finally conn.close()
    assert(raws == Seq(("1", "1,a,x"), ("2", "2,b,y")))
  }

  test("WebSocket output broadcasts field tuples to a connected RFC6455 client") {
    val dir = tmpDir()
    writeCsv(dir, "in.csv", "1,alpha\n2,beta\n")
    val toml =
      s"""[fields]
         |names = ["id", "name"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "WebSocket"
         |fields = ["id", "name"]
         |  [output.config]
         |  Port = 0
         |  WaitForClientSec = 10
         |""".stripMargin
    val compiled = Topology.compileToml(spark, toml)

    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val runner = new Thread(() => {
      val (result, _) = compiled.run()
      assert(result.rows == 2L)
    })
    runner.start()
    // wait for the server to bind, then perform the client handshake
    var port = -1
    val deadline = System.nanoTime() + 10000000000L
    while (port <= 0 && System.nanoTime() < deadline) {
      port = WebSocketOutput.lastBoundPort; Thread.sleep(20)
    }
    assert(port > 0, "WebSocket server did not start")
    val sock = new java.net.Socket("127.0.0.1", port)
    val out = sock.getOutputStream
    out.write(("GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
    out.flush()
    val in = sock.getInputStream
    // read the 101 response up to the blank line
    val resp = new StringBuilder
    while (!resp.endsWith("\r\n\r\n")) resp.append(in.read().toChar)
    assert(resp.toString.contains("101"))
    // the RFC6455 §1.3 sample key has a fixed accept token
    assert(resp.toString.contains("s3pPLMBiTxaQ9kYGzzhZRbK+xOo="))
    // read 2 unmasked text frames
    for (_ <- 1 to 2) {
      val b0 = in.read(); val len = in.read() & 0x7f
      assert((b0 & 0x0f) == 1, "expected a text frame")
      val payload = new Array[Byte](len)
      var off = 0
      while (off < len) off += in.read(payload, off, len - off)
      received.add(new String(payload, "UTF-8"))
    }
    sock.close()
    runner.join(20000)
    assert(!runner.isAlive)
    val got = new java.util.ArrayList[String]()
    received.drainTo(got)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.sorted == Seq("1,alpha", "2,beta"))
  }
}
