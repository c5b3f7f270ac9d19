package graft.sources.plasma

import java.nio.file.Files

import scala.sys.process._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plasma-analog object store: lifecycle contract, arrow payload
  * interop, and true cross-process visibility via a second JVM
  * (reference: cpp/src/plasma/client.h).
  */
class PlasmaStoreSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-plasma").toString

  test("create/seal/get/contains/delete lifecycle") {
    val store = new PlasmaStore(tmp())
    assert(!store.contains("a"))
    val buf = store.create("a", 5, metadata = Array[Byte](9))
    buf.put("hello".getBytes("UTF-8"))
    // unsealed objects are invisible
    assert(!store.contains("a"))
    assert(store.get("a", timeoutMs = 0).isEmpty)
    store.seal("a")
    assert(store.contains("a"))
    val obj = store.get("a").get
    assert(new String(obj.dataBytes, "UTF-8") == "hello")
    assert(obj.metadataBytes.toSeq == Seq(9.toByte))
    // sealed objects are immutable: re-create throws
    intercept[IllegalStateException] { store.create("a", 1) }
    assert(store.list() == Seq("a"))
    assert(store.delete("a"))
    assert(!store.contains("a"))
  }

  test("abort drops an unsealed object as if never created") {
    val store = new PlasmaStore(tmp())
    store.create("x", 3)
    store.abort("x")
    assert(!store.contains("x"))
    store.create("x", 3) // re-creatable after abort
    store.abort("x")
  }

  test("arrow-stream objects roundtrip through spark.read.format(arrow)") {
    val store = new PlasmaStore(tmp())
    val df = graft.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name", "n_regionkey")
    store.putDataFrame("nations", df, metadata = "v1".getBytes("UTF-8"))
    assert(store.schemaOf("nations").get == df.schema)
    val back = store.getDataFrame(spark, "nations").get
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
    // the raw object is readable too, with metadata intact
    val obj = store.get("nations").get
    assert(new String(obj.metadataBytes, "UTF-8") == "v1")
  }

  private def javaBin: String =
    s"${System.getProperty("java.home")}/bin/java"

  test("a second process sees sealed objects (peer put → local get)") {
    val dir = tmp()
    val cmd = Seq(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.tools.PlasmaPeer", "put", dir, "from-peer", "ping-42")
    assert(cmd.! == 0, "peer JVM failed")
    val store = new PlasmaStore(dir)
    val obj = store.get("from-peer", timeoutMs = 5000).get
    assert(new String(obj.dataBytes, "UTF-8") == "ping-42")
    assert(new String(obj.metadataBytes, "UTF-8") == "peer-meta")
  }

  test("a second process blocks on get until this one seals (local put → peer get)") {
    val dir = tmp()
    val store = new PlasmaStore(dir)
    val out = new StringBuilder
    val proc = Seq(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.tools.PlasmaPeer", "get", dir, "late")
      .run(ProcessLogger(s => out.append(s), _ => ()))
    // seal only after the peer is already waiting
    Thread.sleep(300)
    val buf = store.create("late", 4)
    buf.put("pong".getBytes("UTF-8"))
    store.seal("late")
    assert(proc.exitValue() == 0)
    assert(out.toString == "pong")
  }

  test("non-latin object ids stay distinct and list() decodes them") {
    val store = new PlasmaStore(tmp())
    // "\u1000" vs "\u0010\u0000" collided under per-char hex encoding
    val a = "\u1000"; val b = "\u0010\u0000"
    store.create(a, 1).put(1.toByte); store.seal(a)
    assert(!store.contains(b))
    store.create(b, 1).put(2.toByte); store.seal(b)
    assert(store.get(a).get.dataBytes.toSeq == Seq(1.toByte))
    assert(store.get(b).get.dataBytes.toSeq == Seq(2.toByte))
    assert(store.list().toSet == Set(a, b))
  }
}
