package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Schema-driven structured extraction (SURVEY §2.7 F15) — everything the
 * reference's `LLMExtract` agent does EXCEPT the model call, which is the
 * one genuinely non-deterministic, network-bound step (same treatment as
 * [[Multimodal]]'s real-world codec gap: the surrounding machinery is real
 * and tested; the model invocation is a pluggable function).
 *
 * Faithful ports, with reference citations:
 *  - [[removeDefaultProperty]]  — `packages/ai/src/agents/LLMExtract.ts:8-18`
 *  - [[normalizeSchema]]        — `LLMExtract.ts:20-69` (array wrap into an
 *    `{items}` object, type-less objects treated as property maps with all
 *    keys required, `additionalProperties:false` enforced on every object
 *    node). JS quirks are kept bug-for-bug: a falsy `type` ("" / 0) counts
 *    as absent; a schema that IS a JSON array enters the property-map branch
 *    via `Object.entries` and becomes an object keyed "0","1",…; key
 *    insertion order is preserved (json4s `JObject` field order = JS object
 *    property order), with `additionalProperties` appended LAST only when
 *    it was undefined.
 *  - [[createFieldPrompt]]      — `LLMExtract.ts:176-205` (recursive field
 *    listing; array-of-object and object properties expand with 4-space
 *    indent; `type || 'any'` falsy fallback; `'type' in items` is a
 *    PRESENCE check, so a falsy item type renders as-is, not as 'any').
 *  - [[buildExtractionPrompt]]  — `packages/ai/src/prompts/extract.prompts.ts:16-21`.
 *  - [[extractDocs]]            — the `perform` orchestration
 *    (`LLMExtract.ts:277-414`): short texts go through one extractor call;
 *    long texts chunk via [[Chunker]] (maxTokens/overlap), each chunk is
 *    extracted (a failed chunk contributes `null`, `LLMExtract.ts:396-399`),
 *    and results fold through [[ChunkMerge.mergeResults]].
 */
object LLMExtract {

  /** `extract.prompts.ts:2-11` (verbatim, incl. the trailing space on the
    * first line). */
  val ExtractSystemPrompt: String =
    "You are a data extraction assistant. You MUST strictly follow the provided JSON schema structure. \n\n" +
      "CRITICAL RULES:\n" +
      "1. Only extract and return the exact fields defined in the schema\n" +
      "2. Do not add any extra fields, properties, or nested structures not specified in the schema\n" +
      "3. If a field is not found in the content, set it to null rather than creating new structures\n" +
      "4. Follow the exact property names, types, and structure as defined in the schema\n" +
      "5. Do not nest data under additional wrapper objects unless explicitly defined in the schema\n\n" +
      "Return only the JSON object that matches the schema exactly."

  /** `extract.prompts.ts:13-14`. */
  val BaseExtractionPrompt: String =
    "Extract data from the following content and return it in the exact JSON structure defined by the schema. " +
      "IMPORTANT: Only include fields that are defined in the schema. Do not create additional fields or nested structures."

  /** `extract.prompts.ts:16-21`. */
  def buildExtractionPrompt(prompt: Option[String], fieldPrompt: String, content: String): String =
    prompt match {
      case Some(p) => s"$BaseExtractionPrompt User request: $p.$fieldPrompt\n\nContent:\n$content"
      case None    => s"$BaseExtractionPrompt$fieldPrompt\n\nContent:\n$content"
    }

  /** `LLMExtract.ts:8-18`: strip `default` keys recursively. */
  def removeDefaultProperty(v: JValue): JValue = v match {
    case JArray(items) => JArray(items.map(removeDefaultProperty))
    case JObject(fields) =>
      JObject(fields.collect { case (k, value) if k != "default" => k -> removeDefaultProperty(value) })
    case other => other
  }

  /** JS truthiness of a schema's `type` value (`!removeDefaults.type`). */
  private def truthyType(fields: List[(String, JValue)]): Option[JValue] =
    fields.collectFirst { case ("type", t) => t }.filterNot {
      case JNull | JNothing | JString("") | JBool(false) => true
      case JInt(n) => n == 0
      case JLong(n) => n == 0L
      case JDouble(d) => d == 0.0
      case _ => false
    }

  /** `LLMExtract.ts:20-69`. */
  def normalizeSchema(schema: JValue): JValue = {
    val removed = removeDefaultProperty(schema)
    val base = removed match {
      case JObject(fields) if truthyType(fields).contains(JString("array")) =>
        // top-level array schema wraps into a required single-key object
        JObject(
          "type" -> JString("object"),
          "properties" -> JObject("items" -> removed),
          "required" -> JArray(List(JString("items"))),
          "additionalProperties" -> JBool(false))
      case JObject(fields) if truthyType(fields).isEmpty =>
        // type-less object = a map of property schemas; every key required
        JObject(
          "type" -> JString("object"),
          "properties" -> JObject(fields.map { case (k, v) => k -> normalizeSchema(v) }),
          "required" -> JArray(fields.map(f => JString(f._1))),
          "additionalProperties" -> JBool(false))
      case JArray(items) =>
        // JS: a schema that IS an array has no `.type`, falls into the
        // Object.entries branch and becomes an object keyed by index
        JObject(
          "type" -> JString("object"),
          "properties" -> JObject(items.zipWithIndex.map { case (v, i) => i.toString -> normalizeSchema(v) }),
          "required" -> JArray(items.indices.map(i => JString(i.toString)).toList),
          "additionalProperties" -> JBool(false))
      case other => other
    }
    enforceAdditionalFalse(base)
  }

  /** `LLMExtract.ts:51-66`: `additionalProperties:false` on every object
    * node (appended only when undefined), recursing properties and items. */
  private def enforceAdditionalFalse(node: JValue): JValue = node match {
    case JArray(items) => JArray(items.map(enforceAdditionalFalse))
    case JObject(fields) =>
      val tpe = fields.collectFirst { case ("type", JString(t)) => t }
      if (tpe.contains("object")) {
        val withAp =
          if (fields.exists(_._1 == "additionalProperties")) fields
          else fields :+ ("additionalProperties" -> JBool(false))
        JObject(withAp.map {
          case ("properties", JObject(props)) =>
            "properties" -> JObject(props.map { case (k, v) => k -> enforceAdditionalFalse(v) })
          case other => other
        })
      } else if (tpe.contains("array")) {
        JObject(fields.map {
          case ("items", items) if items != JNull && items != JNothing =>
            "items" -> enforceAdditionalFalse(items)
          case other => other
        })
      } else node
    case other => other
  }

  private def strOf(v: JValue): String = v match {
    case JString(s) => s
    case JNothing | JNull => ""
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  private def field(o: JValue, k: String): JValue = o match {
    case JObject(fields) => fields.collectFirst { case (`k`, v) => v }.getOrElse(JNothing)
    case _ => JNothing
  }

  /** `LLMExtract.ts:176-205`: recursive field-description block fed into the
    * extraction prompt. */
  def createFieldPrompt(schema: JValue, indent: String = ""): String = {
    val props = field(schema, "properties") match {
      case JObject(p) => p
      case _ => return ""
    }
    if (props.isEmpty) return ""
    props.map { case (name, propSchema) =>
      val tpe = strOf(field(propSchema, "type")) match { case "" => "any"; case t => t }
      val description = strOf(field(propSchema, "description"))
      if (tpe == "array") {
        val items = field(propSchema, "items")
        val itemType = items match {
          // `'type' in items` — presence, not truthiness
          case JObject(fs) if fs.exists(_._1 == "type") => strOf(fs.collectFirst { case ("type", v) => v }.get)
          case _ => "any"
        }
        val typeDescription = s"(array of ${itemType}s)"
        if (field(items, "type") == JString("object"))
          s"$indent- $name $typeDescription: $description\n${createFieldPrompt(items, indent + "    ")}"
        else s"$indent- $name $typeDescription: $description"
      } else if (tpe == "object") {
        s"$indent- $name (object): $description\n${createFieldPrompt(propSchema, indent + "    ")}"
      } else s"$indent- $name ($tpe): $description"
    }.mkString("\n")
  }

  final case class ExtractedDoc(doc_id: Long, chunks: Int, data: String,
      tokens_input: Long, tokens_output: Long)

  /**
   * The `perform` orchestration (`LLMExtract.ts:277-414`) as a Dataset
   * transform: documents in, one merged extraction per document out.
   *
   * `chunkExtractor(fullPrompt, normalizedSchema)` stands in for
   * `generateObject` — the ONE nondeterministic step; production swaps in a
   * model client, tests use a deterministic fake. A thrown extractor error
   * on a chunk contributes `null` to the merge exactly like
   * `LLMExtract.ts:396-399`; on the single-call (unchunked) path it
   * propagates, like `LLMExtract.ts:358`.
   *
   * Token accounting mirrors the local-estimation fallback
   * (`LLMExtract.ts:144-153`): input = tokens(fullPrompt + systemPrompt),
   * output = tokens(JSON.stringify(result)), summed over calls.
   */
  def extractDocs(docs: DataFrame, idCol: String, textCol: String,
      schemaJson: String, maxTokensInput: Int, chunkOverlap: Int,
      userPrompt: Option[String],
      chunkExtractor: (String, JValue) => JValue,
      systemPrompt: String = ExtractSystemPrompt,
      tokenCounter: String => Int = Chunker.defaultTokenCounter): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(idCol, textCol).as[(Long, String)].mapPartitions { it =>
      val normalized = normalizeSchema(JsonMethods.parse(schemaJson))
      val fieldPrompt = createFieldPrompt(normalized)
      it.map { case (id, textRaw) =>
        val text = if (textRaw == null) "" else textRaw
        var tokIn = 0L
        var tokOut = 0L
        def call(content: String): JValue = {
          val fullPrompt = buildExtractionPrompt(userPrompt, fieldPrompt, content)
          val result = chunkExtractor(fullPrompt, normalized)
          tokIn += tokenCounter(fullPrompt + systemPrompt)
          tokOut += tokenCounter(JsonMethods.compact(JsonMethods.render(result)))
          result
        }
        if (tokenCounter(text) <= maxTokensInput) {
          val obj = call(text)
          ExtractedDoc(id, 1, JsonMethods.compact(JsonMethods.render(obj)), tokIn, tokOut)
        } else {
          val chunks = Chunker.splitTextIntoChunks(text, maxTokensInput, chunkOverlap, tokenCounter)
          val results = chunks.map { c =>
            try call(c.chunk)
            catch { case _: Exception => JNull }
          }
          // nulls flow into the merge unfiltered, as in LLMExtract.ts:398+402
          // (two failed chunks merge to {}; a lone failed chunk returns null)
          val merged = ChunkMerge.mergeResults(results)
          ExtractedDoc(id, chunks.length, JsonMethods.compact(JsonMethods.render(merged)), tokIn, tokOut)
        }
      }
    }
  }
}
