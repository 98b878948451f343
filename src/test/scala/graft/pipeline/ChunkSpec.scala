package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** F16 chunker + A7/U3 merge fidelity (TextChunker.ts / LLMExtract.ts). */
class ChunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("chunk-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import Chunker._

  test("chunker: budget close, overlap backtrack, reference startIndex arithmetic") {
    // 4-token lines, max 16, overlap 4 -> chunks of 4 lines with 1-line overlap
    val text = Array.fill(8)("alpha beta gamma delta").mkString("\n")
    val cs = splitTextIntoChunks(text, maxTokens = 16, overlapTokens = 4)
    assert(cs.map(c => (c.startIndex, c.endIndex, c.tokens)) ==
      Seq((0, 3, 16), (4, 6, 16), (7, 7, 8)))
    // overlap join carries no trailing newline -> the reference GLUES the
    // last overlap line to the next line (TextChunker.ts:44-47); preserved
    assert(cs(1).chunk.startsWith("alpha beta gamma deltaalpha"))
  }

  test("chunker: empty lines are skipped entirely (falsy continue)") {
    val text = "one two\n\n\nthree four\n"
    val cs = splitTextIntoChunks(text, maxTokens = 100, overlapTokens = 0)
    assert(cs.length == 1)
    assert(cs.head.tokens == 4)
    assert(cs.head.chunk == "one two\nthree four")
    // endIndex counts raw split positions, including skipped/trailing empties
    assert(cs.head.endIndex == 4)
  }

  test("chunker: single under-budget text is one chunk; blank text is none") {
    val cs = splitTextIntoChunks("just one line", 100, 10)
    assert(cs == Seq(Chunk("just one line", 0, 0, 3)))
    assert(splitTextIntoChunks("", 100, 10).isEmpty)
    assert(splitTextIntoChunks("\n\n", 100, 10).isEmpty)
  }

  test("chunker: stats") {
    val cs = Seq(Chunk("a", 0, 0, 10), Chunk("b", 1, 1, 20), Chunk("c", 2, 2, 31))
    assert(chunkStats(cs) == ChunkStats(3, 61, 20, 10, 31))
    assert(chunkStats(Nil) == ChunkStats(0, 0, 0, 0, 0))
  }

  test("chunker: Spark transform explodes documents into chunk rows") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, Array.fill(8)("alpha beta gamma delta").mkString("\n")),
      (2L, "short line")).toDF("doc_id", "text")
    val rows = Chunker.chunkDocs(docs, "doc_id", "text", 16, 4).collect()
    assert(rows.count(_.doc_id == 1L) == 3)
    assert(rows.count(_.doc_id == 2L) == 1)
    assert(rows.filter(_.doc_id == 1L).sortBy(_.chunk_idx).map(_.tokens).toSeq == Seq(16, 16, 8))
  }

  private def j(s: String): JValue = JsonMethods.parse(s)
  private def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  test("merge: arrays concat + first-occurrence dedup (stringify key for objects)") {
    val m = ChunkMerge.mergeResults(Seq(
      j("""{"tags":["a","b"],"objs":[{"x":1},{"x":2}]}"""),
      j("""{"tags":["b","c","a"],"objs":[{"x":2},{"x":3}]}""")))
    assert(render(m) == """{"tags":["a","b","c"],"objs":[{"x":1},{"x":2},{"x":3}]}""")
  }

  test("merge: shallow object merge, later chunk wins per key") {
    val m = ChunkMerge.mergeResults(Seq(
      j("""{"meta":{"a":1,"b":1}}"""), j("""{"meta":{"a":2,"c":3}}""")))
    assert(render(m) == """{"meta":{"a":2,"b":1,"c":3}}""")
  }

  test("merge: falsy stored values are overwritten; truthy scalars keep first") {
    val m = ChunkMerge.mergeResults(Seq(
      j("""{"title":"","n":0,"flag":false,"kept":"first"}"""),
      j("""{"title":"real","n":7,"flag":true,"kept":"second"}""")))
    assert(render(m) == """{"title":"real","n":7,"flag":true,"kept":"first"}""")
  }

  test("merge: null fields skipped; single result returned as-is") {
    val m = ChunkMerge.mergeResults(Seq(
      j("""{"a":null,"b":1}"""), j("""{"a":"x","c":null}""")))
    assert(render(m) == """{"b":1,"a":"x"}""")
    assert(render(ChunkMerge.mergeResults(Seq(j("""{"a":null}""")))) == """{"a":null}""")
    assert(ChunkMerge.mergeResults(Nil) == JNull)
  }

  test("merge: Spark transform folds chunk rows in chunk order per doc") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, 1, """{"meta":{"a":1}}"""),
      (1L, 0, """{"meta":{"a":0},"t":["x"]}"""),
      (2L, 0, """{"t":["y"]}"""))
      .toDF("doc_id", "chunk_idx", "chunk_json")
    val out = ChunkMerge.mergeChunkResults(rows, "doc_id", "chunk_idx", "chunk_json")
      .collect().map(r => r.doc_id -> r.merged).toMap
    // chunk 1 merged AFTER chunk 0 despite row order -> meta.a = 1
    assert(out(1L) == """{"meta":{"a":1},"t":["x"]}""")
    assert(out(2L) == """{"t":["y"]}""")
  }
}
