package graft.sources

import graft.SparkSpec

class PlasmaCatalogSpec extends SparkSpec {
  import sqlImplicits._

  test("put/get/contains/delete lifecycle") {
    PlasmaCatalog.clear()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    PlasmaCatalog.put("obj1", df)
    assert(PlasmaCatalog.contains("obj1"))
    assert(PlasmaCatalog.get("obj1").get.count() == 2)
    assert(spark.sql("SELECT count(*) FROM plasma_obj1").as[Long].head() == 2L)
    assert(PlasmaCatalog.delete("obj1"))
    assert(!PlasmaCatalog.contains("obj1"))
    assert(!PlasmaCatalog.delete("obj1"))
  }

  test("objects are immutable once sealed (plasma semantics)") {
    PlasmaCatalog.clear()
    val df = Seq(1).toDF("x")
    PlasmaCatalog.put("sealed", df)
    intercept[IllegalStateException] {
      PlasmaCatalog.put("sealed", Seq(2).toDF("x"))
    }
    PlasmaCatalog.put("sealed", Seq(2).toDF("x"), overwrite = true)
    assert(PlasmaCatalog.get("sealed").get.as[Int].head() == 2)
    PlasmaCatalog.clear()
  }

  test("get returns the cached plan (storage level set)") {
    PlasmaCatalog.clear()
    val df = graft.Tables.nation(spark, sfDir)
    val cached = PlasmaCatalog.put("nation", df)
    assert(cached.storageLevel.useMemory)
    PlasmaCatalog.clear()
  }
}
