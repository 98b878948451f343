package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Per-document merge of per-chunk extraction results (SURVEY §2.4 A7 +
 * §2.6 U3) — a faithful port of the reference's merge strategy
 * (`packages/ai/src/agents/LLMExtract.ts:210-256`), minus the LLM that
 * produces the chunk objects there (the merge itself is pure JSON
 * machinery; callers feed it any per-chunk extractor's output):
 *
 *  - fold chunk objects IN CHUNK ORDER; null results skipped;
 *  - null/undefined field values skipped;
 *  - absent key => take the value;
 *  - array + array => concatenate, then dedup keeping FIRST occurrence,
 *    keyed by the serialized form for objects and the raw value otherwise
 *    (`deduplicateArray`, LLMExtract.ts:246-256 — U3);
 *  - object + object => shallow merge, later chunk wins per key
 *    (`{ ...merged, ...value }`);
 *  - scalar + scalar => keep the earlier value unless it was null/empty
 *    string ("prefer non-empty").
 */
object ChunkMerge {

  /** LLMExtract.ts:246-256. */
  def deduplicateArray(arr: List[JValue]): List[JValue] = {
    val seen = scala.collection.mutable.HashSet[String]()
    arr.filter { item =>
      val key = item match {
        case _: JObject | _: JArray => JsonMethods.compact(JsonMethods.render(item))
        case JString(s) => "s:" + s
        case other => "v:" + other.toString
      }
      seen.add(key)
    }
  }

  private def isNullish(v: JValue): Boolean = v == JNull || v == JNothing

  /** JS falsiness of a stored value: the reference's `if (!merged[key])`
    * branch treats null/""/0/false as "absent", so a later chunk's value
    * replaces them outright (empty arrays/objects are truthy and do not). */
  private def isFalsy(v: JValue): Boolean = v match {
    case JNull | JNothing | JString("") | JBool(false) => true
    case JInt(n) => n == 0
    case JLong(n) => n == 0L
    case JDouble(d) => d == 0.0
    case JDecimal(d) => d.signum == 0
    case _ => false
  }

  /** LLMExtract.ts:210-244. */
  def mergeResults(results: Seq[JValue]): JValue = {
    val present = results
    if (present.isEmpty) return JNull
    if (present.length == 1) return present.head
    var merged = Map.empty[String, JValue]
    var order = Vector.empty[String] // JS object key insertion order
    present.foreach {
      case JObject(fields) =>
        fields.foreach { case (key, value) =>
          if (!isNullish(value)) {
            merged.get(key) match {
              case None =>
                merged += key -> value; order :+= key
              case Some(cur) if isFalsy(cur) =>
                merged += key -> value // `if (!merged[key])` falsy overwrite
              case Some(JArray(a)) =>
                value match {
                  case JArray(b) => merged += key -> JArray(deduplicateArray(a ++ b))
                  case v => merged += key -> mergePrimitive(JArray(a), v)
                }
              case Some(JObject(a)) =>
                value match {
                  // shallow merge, later wins ({ ...merged[key], ...value })
                  case JObject(b) =>
                    val keys = (a.map(_._1) ++ b.map(_._1)).distinct
                    val bm = b.toMap
                    val am = a.toMap
                    merged += key -> JObject(keys.map(k => k -> bm.getOrElse(k, am(k))): _*)
                  case v => merged += key -> mergePrimitive(JObject(a), v)
                }
              case Some(cur) => merged += key -> mergePrimitive(cur, value)
            }
          }
        }
      case _ => // non-object chunk results are skipped like JS's for..of over entries of null
    }
    JObject(order.map(k => k -> merged(k)).toList)
  }

  /** "For primitive values, prefer non-empty values." */
  private def mergePrimitive(cur: JValue, next: JValue): JValue =
    if (isNullish(cur) || cur == JString("")) next else cur

  final case class MergedDoc(doc_id: Long, merged: String)

  /** The Spark shape: chunk-result rows (doc, chunk index, json) fold into
    * one merged object per document. `mapGroups` with an explicit in-group
    * sort — the merge is order-sensitive (later chunks win shallow-object
    * keys), and Spark group iterators carry no ordering guarantee. */
  def mergeChunkResults(chunks: DataFrame, idCol: String, idxCol: String,
      jsonCol: String): Dataset[MergedDoc] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.select(idCol, idxCol, jsonCol).as[(Long, Int, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val ordered = it.toArray.sortBy(_._2)
        val parsed = ordered.iterator.map(_._3).flatMap { s =>
          try Some(JsonMethods.parse(s)) catch { case _: Exception => None }
        }.toSeq
        MergedDoc(id, JsonMethods.compact(JsonMethods.render(mergeResults(parsed))))
      }
  }
}
