package graft.sources

import org.apache.spark.sql.types.{StringType, StructType}

/** Shared driver-side validation for the dictionary-encoded
  * ("category") write options of the feather v1 and Arrow JSON
  * integration writers — one rule set, one place to evolve it.
  */
private[sources] object CategoryColumns {
  def validate(schema: StructType, categories: Set[String], format: String): Unit =
    categories.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"$format category column $c not in schema")
      require(schema(c).dataType == StringType,
        s"$format category column $c must be string, got ${schema(c).dataType}")
    }
}
