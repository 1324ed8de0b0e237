package graft

import graft.sources.JsonlDocuments

class JsonlDocumentsSpec extends SparkSpec {

  test("jsonl ingest: clean rows typed, damaged and drifted lines quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "src0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "src1", "n_chars": 4}""",
      """{"doc_id": 3, "text": "three", "lang": "en", "source": "src0"}""", // missing field -> NULL n_chars, still clean
      """{"doc_id": 4, "text": "truncat""", // damaged JSON
      """not json at all""",
      """{"doc_id": "not-a-number", "text": "drift", "lang": "en", "source": "s", "n_chars": 5}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val res = JsonlDocuments.read(spark, dir.toString)
    val clean = res.clean.collect()
    assert(clean.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    val byId = clean.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === "hello world")
    assert(byId(1L).getLong(4) === 11L)
    assert(byId(3L).isNullAt(4)) // absent optional field stays NULL, row kept
    val q = res.quarantine.collect().map(_.getString(0)).toSet
    assert(q === Set(lines(3), lines(4), lines(5)), s"quarantined: $q")
    res.quarantine.collect().foreach(r =>
      assert(r.getString(1).contains("part-0.jsonl")))
  }

  test("jsonl ingest: all-clean file produces an empty quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.write(dir.resolve("ok.jsonl"),
      """{"doc_id": 9, "text": "t", "lang": "en", "source": "s", "n_chars": 1}"""
        .getBytes("UTF-8"))
    val res = JsonlDocuments.read(spark, dir.toString)
    assert(res.clean.count() === 1L)
    assert(res.quarantine.count() === 0L)
  }
}
