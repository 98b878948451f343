package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Token-budgeted text chunking with overlap (SURVEY §2.7 F16) — a faithful
 * port of the reference's line-based splitter
 * (`packages/ai/src/agents/TextChunker.ts:20-88`), minus the LLM call it
 * feeds there. Chunking itself is pure text machinery and a first-class
 * training-data op (context-window packing), so it ships despite the F15
 * LLM-extraction non-goal.
 *
 * Semantics preserved exactly:
 *  - split on '\n'; EMPTY lines are skipped entirely (the `if (!line)
 *    continue` falsy check — they contribute neither tokens nor content);
 *  - a chunk closes when adding the next line would exceed `maxTokens`
 *    (closed chunks report the token count ACCUMULATED so far, counted per
 *    `line + "\n"`);
 *  - the next chunk starts with backtracked overlap lines: walking
 *    backwards while the running token count (counted per bare line) stays
 *    <= `overlapTokens`;
 *  - `startIndex = max(0, i - overlapLines + 1)` — one PAST the first
 *    overlap line, exactly as the reference computes it (TextChunker.ts:47;
 *    kept bug-for-bug so chunk provenance matches);
 *  - final chunk emitted when non-blank after trim.
 *
 * The token counter is injectable like the reference's (which passes the
 * model tokenizer); the default is [[TextAnalysis]]'s BPE-ish rule (letter/
 * digit runs + single symbols), the deterministic stand-in this sandbox
 * uses everywhere.
 */
object Chunker {

  final case class Chunk(chunk: String, startIndex: Int, endIndex: Int, tokens: Int)

  /** Default token counter: letter/digit runs + single non-space symbols —
    * the Scala twin of TextAnalysis.tokenCountMatches. */
  val defaultTokenCounter: String => Int = {
    val p = java.util.regex.Pattern.compile("""[\p{L}\p{N}]+|[^\p{L}\p{N}\s]""")
    (s: String) => {
      val m = p.matcher(s)
      var n = 0
      while (m.find()) n += 1
      n
    }
  }

  /** TextChunker.ts:20-66. */
  def splitTextIntoChunks(text: String, maxTokens: Int, overlapTokens: Int,
      tokenCounter: String => Int = defaultTokenCounter): Seq[Chunk] = {
    val lines = text.split("\n", -1)
    val chunks = Seq.newBuilder[Chunk]
    val current = new StringBuilder
    var currentTokens = 0
    var startIndex = 0
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.nonEmpty) { // `if (!line) continue`
        val lineTokens = tokenCounter(line + "\n")
        if (currentTokens + lineTokens > maxTokens && current.nonEmpty) {
          chunks += Chunk(current.toString.trim, startIndex, i - 1, currentTokens)
          val overlap = overlapLines(lines, i, overlapTokens, tokenCounter)
          current.clear()
          current.append(overlap.mkString("\n"))
          currentTokens = tokenCounter(current.toString)
          startIndex = math.max(0, i - overlap.length + 1)
        }
        current.append(line).append('\n')
        currentTokens += lineTokens
      }
      i += 1
    }
    if (current.toString.trim.nonEmpty)
      chunks += Chunk(current.toString.trim, startIndex, lines.length - 1, currentTokens)
    chunks.result()
  }

  /** TextChunker.ts:68-88: walk backwards from `currentIndex`, collecting
    * lines while the running (bare-line) token total stays within budget. */
  private def overlapLines(lines: Array[String], currentIndex: Int, overlapTokens: Int,
      tokenCounter: String => Int): List[String] = {
    var out = List.empty[String]
    var tokens = 0
    var i = currentIndex - 1
    var stop = false
    while (i >= 0 && !stop) {
      val line = lines(i)
      if (line.nonEmpty) {
        val lineTokens = tokenCounter(line)
        if (tokens + lineTokens > overlapTokens) stop = true
        else { out = line :: out; tokens += lineTokens }
      }
      i -= 1
    }
    out
  }

  /** getChunkStats (TextChunker.ts:101-131). */
  final case class ChunkStats(totalChunks: Int, totalTokens: Int,
      averageTokensPerChunk: Int, minTokens: Int, maxTokens: Int)

  def chunkStats(chunks: Seq[Chunk]): ChunkStats =
    if (chunks.isEmpty) ChunkStats(0, 0, 0, 0, 0)
    else {
      val total = chunks.map(_.tokens).sum
      ChunkStats(chunks.length, total, math.round(total.toDouble / chunks.length).toInt,
        chunks.map(_.tokens).min, chunks.map(_.tokens).max)
    }

  final case class DocChunk(doc_id: Long, chunk_idx: Int, start_line: Int,
      end_line: Int, tokens: Int, chunk: String)

  /** The Spark shape: one kernel pass per partition, documents in, exploded
    * chunk rows out — the context-window packer of a training-data pipeline
    * (and the fan-out side of the reference's chunk->LLM->merge loop). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlapTokens: Int): Dataset[DocChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(idCol, textCol).as[(Long, String)].mapPartitions { it =>
      it.flatMap { case (id, text) =>
        splitTextIntoChunks(if (text == null) "" else text, maxTokens, overlapTokens)
          .zipWithIndex.map { case (c, k) =>
            DocChunk(id, k, c.startIndex, c.endIndex, c.tokens, c.chunk)
          }
      }
    }
  }
}
