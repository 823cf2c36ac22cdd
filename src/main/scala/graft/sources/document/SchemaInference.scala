package graft.sources.document

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

/** Schema inference by sampling for schemaless document collections.
  *
  * Mirrors the reference MongoDB module's deterministic rules
  * (`crates/mongodb/src/utils/schema.rs:9-131`):
  *   - scalars map directly (int32 / int64 / double / bool / string);
  *   - ARRAYS become `array<string>` — document arrays can be
  *     heterogeneous (`[1, "foo", true]`), a typed column cannot;
  *   - NESTED DOCUMENTS become a JSON string column;
  *   - null infers as NullType until unified with a real type;
  *   - unification: equal→same, Null∨T→T, Int∨Long→Long,
  *     Int/Long∨Double→Double, anything else→String (the universal
  *     fallback);
  *   - fields sort by name and are always nullable, so the same sample
  *     yields the same schema on every run.
  *
  * And the declared-schema merge (`crates/common/src/util/schema.rs:18-56`):
  * declared fields override inferred ones in place, inferred-only fields
  * are kept, declared-only fields are appended.
  */
object SchemaInference {

  def inferType(v: JsonNode): DataType =
    if (v == null || v.isNull) NullType
    else if (v.isBoolean) BooleanType
    else if (v.isInt) IntegerType
    else if (v.isLong) LongType
    else if (v.isBigInteger) DecimalType(38, 0)
    else if (v.isNumber) DoubleType
    else if (v.isTextual) StringType
    else if (v.isArray) ArrayType(StringType, containsNull = true)
    else StringType // nested document → JSON string

  def unify(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, t) => t
    case (t, NullType) => t
    case (IntegerType, LongType) | (LongType, IntegerType) => LongType
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => DoubleType
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case _ => StringType
  }

  /** Infer a deterministic schema from sample documents.
    *
    * `flattenDepth` > 0 flattens nested documents into dotted columns
    * before inference, to that depth (the reference Mongo module's
    * unnest pass, `crates/mongodb/src/utils/unnest.rs:21-60`): with
    * depth 1, `{"props": {"k": 5}}` infers a typed `props.k` column
    * instead of a JSON-string `props`. Anything deeper than the limit
    * still folds to a JSON string at the boundary. Dots act as path
    * separators throughout the source (the document-store convention),
    * so flattened names stay addressable by filters and sorts.
    */
  def infer(docs: Seq[JsonNode], flattenDepth: Int = 0): StructType = {
    val types = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    def record(name: String, v: JsonNode, depth: Int): Unit =
      if (v != null && v.isObject && depth < flattenDepth) {
        val it = v.fields()
        while (it.hasNext) {
          val e = it.next()
          record(name + "." + e.getKey, e.getValue, depth + 1)
        }
      } else {
        val t = inferType(v)
        types.update(name, types.get(name).map(unify(_, t)).getOrElse(t))
      }
    docs.foreach { d =>
      val it = d.fields()
      while (it.hasNext) {
        val e = it.next()
        record(e.getKey, e.getValue, 0)
      }
    }
    StructType(types.toSeq.sortBy(_._1).map { case (n, t) =>
      StructField(n, if (t == NullType) StringType else t, nullable = true)
    })
  }

  /** Declared fields override inferred in place; inferred-only kept;
    * declared-only appended.
    */
  def mergeDeclared(inferred: StructType, declared: Option[StructType]): StructType =
    declared match {
      case None => inferred
      case Some(dec) =>
        val byName = dec.fields.map(f => f.name -> f).toMap
        val inferredNames = inferred.fieldNames.toSet
        StructType(
          inferred.fields.map(f => byName.getOrElse(f.name, f)) ++
            dec.fields.filterNot(f => inferredNames.contains(f.name)))
    }
}
