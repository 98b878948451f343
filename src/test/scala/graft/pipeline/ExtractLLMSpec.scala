package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** F15 schema normalization + extraction orchestration fidelity
  * (LLMExtract.ts:8-69,176-205,277-414; extract.prompts.ts). Expected values
  * are hand-traced from the reference source, not from running this code. */
class ExtractLLMSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("extract-llm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import LLMExtract._

  private def j(s: String): JValue = JsonMethods.parse(s)
  private def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  val schemaJson: String =
    """{"title":{"type":"string","default":"none","description":"Page title"},
      |"tags":{"type":"array","items":{"type":"string"}},
      |"author":{"type":"object","properties":{"name":{"type":"string"},"age":{"type":"number","default":0}},"required":["name"]}}""".stripMargin

  val expectedNorm: String =
    """{"type":"object","properties":{""" +
      """"title":{"type":"string","description":"Page title"},""" +
      """"tags":{"type":"object","properties":{"items":{"type":"array","items":{"type":"string"}}},"required":["items"],"additionalProperties":false},""" +
      """"author":{"type":"object","properties":{"name":{"type":"string"},"age":{"type":"number"}},"required":["name"],"additionalProperties":false}},""" +
      """"required":["title","tags","author"],"additionalProperties":false}"""

  test("removeDefaultProperty strips defaults recursively, incl. inside arrays") {
    val v = j("""{"a":{"default":1,"b":[{"default":2,"c":3}]},"default":0}""")
    assert(render(removeDefaultProperty(v)) == """{"a":{"b":[{"c":3}]}}""")
  }

  test("normalizeSchema: type-less property map -> object with all keys required") {
    assert(render(normalizeSchema(j(schemaJson))) == expectedNorm)
  }

  test("normalizeSchema: top-level array wraps into required {items}; nested objects get additionalProperties") {
    val in = j("""{"type":"array","items":{"type":"object","properties":{"x":{"type":"string","default":"d"}}}}""")
    assert(render(normalizeSchema(in)) ==
      """{"type":"object","properties":{"items":{"type":"array","items":""" +
        """{"type":"object","properties":{"x":{"type":"string"}},"additionalProperties":false}}},""" +
        """"required":["items"],"additionalProperties":false}""")
  }

  test("normalizeSchema: falsy type counts as absent (JS !type); existing additionalProperties kept in place") {
    // type:"" is falsy -> the property-map branch fires and recurses values
    val in = j("""{"type":"","x":{"type":"object","properties":{},"additionalProperties":true}}""")
    assert(render(normalizeSchema(in)) ==
      """{"type":"object","properties":{"type":"","x":{"type":"object","properties":{},"additionalProperties":true}},""" +
        """"required":["type","x"],"additionalProperties":false}""")
  }

  test("normalizeSchema: a schema that IS an array becomes an index-keyed object (Object.entries quirk)") {
    val in = j("""[{"type":"string"},{"type":"number"}]""")
    assert(render(normalizeSchema(in)) ==
      """{"type":"object","properties":{"0":{"type":"string"},"1":{"type":"number"}},""" +
        """"required":["0","1"],"additionalProperties":false}""")
  }

  test("createFieldPrompt: scalar, wrapped-array, object expansion with 4-space indents") {
    assert(createFieldPrompt(normalizeSchema(j(schemaJson))) ==
      "- title (string): Page title\n" +
        "- tags (object): \n" +
        "    - items (array of strings): \n" +
        "- author (object): \n" +
        "    - name (string): \n" +
        "    - age (number): ")
  }

  test("createFieldPrompt: array-of-objects expands items; 'type' in items is a presence check") {
    val s1 = j("""{"type":"object","properties":{"people":{"type":"array","description":"List","items":{"type":"object","properties":{"name":{"type":"string","description":"Full name"}}}}}}""")
    assert(createFieldPrompt(s1) == "- people (array of objects): List\n    - name (string): Full name")
    // items with a falsy-but-present type renders that value, not 'any'
    val s2 = j("""{"type":"object","properties":{"a":{"type":"array","items":{"type":""}},"b":{"type":"array","items":{}},"c":{}}}""")
    assert(createFieldPrompt(s2) == "- a (array of s): \n- b (array of anys): \n- c (any): ")
  }

  test("buildExtractionPrompt with and without a user request") {
    assert(buildExtractionPrompt(None, "FP", "C") == BaseExtractionPrompt + "FP\n\nContent:\nC")
    assert(buildExtractionPrompt(Some("find X"), "FP", "C") ==
      BaseExtractionPrompt + " User request: find X.FP\n\nContent:\nC")
  }

  import ExtractLLMSpec.{contentOf, fake}

  test("extractDocs: short text takes the single-call path; long text chunks and merges") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, Array.fill(8)("alpha beta gamma delta").mkString("\n")), // 32 tokens -> 3 chunks (91/90/44 chars)
      (2L, "short line")).toDF("doc_id", "text")
    val out = extractDocs(docs, "doc_id", "text", schemaJson, 16, 4, None, fake)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).chunks == 3)
    assert(out(1L).data ==
      """{"title":"T90","len":91,"tags":["L0","L6","L2"],"meta":{"last":44}}""")
    assert(out(2L).chunks == 1)
    assert(out(2L).data == """{"title":"T10","len":10,"tags":["L3"],"meta":{"last":10},"nil":null}""")
  }

  test("extractDocs: a failing chunk contributes null to the merge; all-fail merges to {}") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, Array.fill(8)("alpha beta gamma delta").mkString("\n"))).toDF("doc_id", "text")
    val failMiddles = ExtractLLMSpec.failMiddles
    val one = extractDocs(docs, "doc_id", "text", schemaJson, 16, 4, None, failMiddles).collect().head
    assert(one.chunks == 3)
    assert(one.data == """{"title":"T44","len":91,"tags":["L0","L2"],"meta":{"last":44}}""")
    val allFail = ExtractLLMSpec.allFail
    val two = extractDocs(docs, "doc_id", "text", schemaJson, 16, 4, None, allFail).collect().head
    assert(two.data == "{}")
  }

  test("extractDocs: token accounting follows the local-estimation fallback") {
    val s = spark; import s.implicits._
    val docs = Seq((2L, "short line")).toDF("doc_id", "text")
    val out = extractDocs(docs, "doc_id", "text", schemaJson, 16, 4, None, fake).collect().head
    val norm = normalizeSchema(j(schemaJson))
    val fp = createFieldPrompt(norm)
    val prompt = buildExtractionPrompt(None, fp, "short line")
    val obj = fake(prompt, norm)
    assert(out.tokens_input == Chunker.defaultTokenCounter(prompt + ExtractSystemPrompt))
    assert(out.tokens_output == Chunker.defaultTokenCounter(render(obj)))
  }
}

/** Serializable home for the deterministic generateObject stand-ins (a spec
  * class captures scalatest's Engine and cannot ship into tasks). */
object ExtractLLMSpec extends Serializable {
  def contentOf(fullPrompt: String): String =
    fullPrompt.substring(fullPrompt.indexOf("\n\nContent:\n") + 11)

  val fake: (String, JValue) => JValue = (p, _) => {
    val c = contentOf(p)
    JObject(
      "title" -> (if (c.length == 91) JString("") else JString("T" + c.length)),
      "len" -> JInt(c.length),
      "tags" -> JArray(List(JString("L" + c.length % 7))),
      "meta" -> JObject("last" -> JInt(c.length)),
      "nil" -> JNull)
  }

  val failMiddles: (String, JValue) => JValue = (p, sch) => {
    val c = contentOf(p)
    if (c.length == 90) throw new RuntimeException("boom") else fake(p, sch)
  }

  val allFail: (String, JValue) => JValue = (_, _) => throw new RuntimeException("boom")
}
