package graft

import graft.sources.CsvDocuments

class CsvDocumentsSpec extends SparkSpec {

  test("csv ingest: clean rows typed, header dropped, damaged and drifted rows quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val lines = Seq(
      "doc_id,text,lang,source,n_chars", // header — dropped, not quarantined
      "1,hello world,en,src0,11",
      "2,zwei,de,src1,4",
      "3,three,en,src0,", // empty optional field -> NULL n_chars, still clean
      "4,\"unclosed quote,en,src0,5", // quote damage
      "not-a-number,drift,en,s,5", // doc_id type drift -> keyless
      "7,too,many,cols,5,EXTRA") // column-count damage
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val res = CsvDocuments.read(spark, dir.toString)
    val clean = res.clean.collect()
    assert(clean.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L),
      s"clean ids: ${clean.map(_.getLong(0)).toSeq}")
    val byId = clean.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === "hello world")
    assert(byId(1L).getLong(4) === 11L)
    assert(byId(3L).isNullAt(4))
    val q = res.quarantine.collect().map(_.getString(0)).toSet
    assert(q === Set(lines(4), lines(5), lines(6)), s"quarantined: $q")
    res.quarantine.collect().foreach(r =>
      assert(r.getString(1).contains("part-0.csv")))
  }

  test("csv ingest: a reordered header is the misordered-file detection signal") {
    // column order is positional (the documented contract): a vendor
    // file with swapped columns cannot be caught row-by-row when the
    // swap is string<->string, but its HEADER fails the canonical
    // match and surfaces in quarantine — one row per misordered file
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.write(dir.resolve("swapped.csv"),
      "doc_id,lang,text,source,n_chars\n7,en,hello,src0,5".getBytes("UTF-8"))
    val res = CsvDocuments.read(spark, dir.toString)
    val q = res.quarantine.collect().map(_.getString(0))
    assert(q.contains("doc_id,lang,text,source,n_chars"),
      s"reordered header not quarantined: ${q.toSeq}")
  }

  test("csv ingest: all-clean file produces an empty quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.write(dir.resolve("ok.csv"),
      "doc_id,text,lang,source,n_chars\n9,t,en,s,1".getBytes("UTF-8"))
    val res = CsvDocuments.read(spark, dir.toString)
    assert(res.clean.count() === 1L)
    assert(res.quarantine.count() === 0L)
  }
}
