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

  /** Infer a deterministic schema from sample documents. */
  def infer(docs: Seq[JsonNode]): StructType = {
    val types = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    docs.foreach { d =>
      val it = d.fields()
      while (it.hasNext) {
        val e = it.next()
        val t = inferType(e.getValue)
        types.update(e.getKey, types.get(e.getKey).map(unify(_, t)).getOrElse(t))
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
