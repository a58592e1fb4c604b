package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 ranking semantics on planted fixtures. */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("bm25: rare terms outweigh common terms, tf saturates, length normalizes") {
    val filler = (1 to 30).map(_ => "common").mkString(" ")
    val docs = docsOf(Seq(
      s"rare $filler",            // 0: one rare hit, long doc
      "rare common",              // 1: one rare hit, short doc
      "common common common",     // 2: common only
      s"rare rare $filler",       // 3: two rare hits, long doc
      "unrelated words entirely") // 4: no hits
    ) // "rare" df=3, "common" df=4 over 5 docs
    val got = TextOps.bm25Search(docs, "doc_id", "text",
      terms = Seq("rare", "common"), k = 10)
      .as[(Long, Long, Long)].collect()
    val order = got.map(_._1).toSeq
    val score = got.map(g => g._1 -> g._3).toMap
    assert(!score.contains(4L), "docs with no query term must be absent")
    assert(score.keySet == Set(0L, 1L, 2L, 3L))
    // short doc with the rare term beats the long doc with the rare term
    assert(score(1L) > score(0L), s"length normalization: $score")
    // two rare hits beat one (same length)
    assert(score(3L) > score(0L), s"tf monotone: $score")
    // any rare hit beats common-only
    assert(score(2L) < score(0L) && score(2L) < score(1L), s"idf ordering: $score")
    assert(order == order.sortBy(id => (-score(id), id)), "output is rank-ordered")
  }

  test("token drift: a token concentrated in the appended slice tops the report") {
    // slice A = ids 0..49; appended docs 50..59 introduce "novelword"
    val docs = ((0 until 50).map(i => (i.toLong, "stable filler content here")) ++
      (50 until 60).map(i => (i.toLong, "novelword novelword stable filler")))
      .toDF("doc_id", "text")
    val got = TextOps.tokenDrift(docs, "doc_id", "text", isA = $"doc_id" < 50, k = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.head._1 == "novelword", s"got ${got.toSeq}")
    assert(got.head._2 == 0L, "absent from slice A")
    assert(got.head._3 == 20L, "20 occurrences in the full corpus")
    // drift of novelword = its full-corpus ppm (ppm_a = 0)
    assert(got.head._6 == got.head._5)
    // report is sorted by drift desc then token
    val drifts = got.map(_._6).toSeq
    assert(drifts == drifts.sorted.reverse)
  }

  test("lm score: reference-like text scores high, garbled text low, short docs absent") {
    val fluent = (1 to 10).map(_ => "the cat sat on the mat").mkString(" ")
    val rnd = new scala.util.Random(3)
    val garbled = (1 to 60).map(_ => rnd.alphanumeric.take(7).mkString.toLowerCase).mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, fluent)) :+ (20L, garbled) :+ (21L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(docs, "doc_id", "text", refPermille = 1000)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(!got.contains(21L), "sub-2-token docs have no bigrams")
    assert(got(0L) > got(20L) * 10,
      s"fluent must dominate garbled: fluent=${got(0L)} garbled=${got(20L)}")
    // determinism
    val again = TextOps.lmScore(docs, "doc_id", "text", refPermille = 1000)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == again)
  }

  test("bm25: deterministic across runs and result is top-k truncated") {
    val docs = docsOf((0 until 50).map(i => s"term$i shared payload number $i"))
    val a = TextOps.bm25Search(docs, "doc_id", "text", Seq("shared", "term3"), k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    val b = TextOps.bm25Search(docs, "doc_id", "text", Seq("shared", "term3"), k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 5)
    assert(a.head._1 == 3L, s"the doc containing the rare term must rank first: $a")
  }

  test("mixedLangReport: code-switched docs show a minority share, pure docs none") {
    val en = (1 to 8).map(_ => "the and of to is").mkString(" ")     // 5 en markers / 8-token seg
    val de = (1 to 8).map(_ => "der die das und ist").mkString(" ")
    val docs = docsOf(Seq(en, en + " " + de, ""))
    val got = TextOps.mixedLangReport(docs, "doc_id", "text")
      .as[(Long, Long, Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(2L), "empty-norm docs are absent")
    val pure = got(0L)
    assert(pure._3 === 1L && pure._4 === "en" && pure._5 === 0L)
    val mixed = got(1L)
    assert(mixed._3 >= 2L, "both languages detected at segment level")
    assert(mixed._5 > 0L && mixed._5 < 1000000L,
      s"minority share strictly between 0 and 1: $mixed")
  }

  test("specialTokens query source: occurrence counts and hygiene flag") {
    val docs = docsOf(Seq(
      "clean document text here",
      "leaked <|endoftext|> marker <|endoftext|> twice and [INST] once"))
    // the registered query reads Tables.documents; rebuild its projection
    // on the fixture instead (same expressions, same semantics)
    val counts = Seq("<|endoftext|>", "<|im_start|>", "</s>", "[INST]").map { p =>
      expr(s"(length(text) - length(replace(text, '$p', ''))) div ${p.length}")
    }
    val res = docs.select(col("doc_id"),
      counts.reduce(_ + _).cast("long").as("n_special"))
      .as[(Long, Long)].collect().toMap
    assert(res(0L) === 0L && res(1L) === 3L)
  }

  test("extractMarkup: real HTML — nested link tags, entities, boilerplate density") {
    val pages = Seq(
      (1L, "<html><p>Tom &amp; Jerry say &quot;hi&quot;</p></html>"),
      // nav-boilerplate page: almost all visible text is anchor text
      (2L, "<div><a href=\"/a\">home</a> <a href=\"/b\"><b>about us</b></a> x</div>"),
      (3L, "no markup at all"),
      (4L, "")
    ).toDF("doc_id", "html")
    val got = TextOps.extractMarkup(pages, "doc_id", "html").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // p1: 4 tags, no links; clean = «Tom & Jerry say "hi"» = 20 chars
    assert(got(1L) === ((4L, 0L, 20L, 0L, 0L)))
    // p2: clean = «home about us x» (15); link chars = 4 + 8 («about us»,
    // inner <b> stripped) = 12 -> density 800000 ppm
    assert(got(2L) === ((8L, 2L, 15L, 12L, 800000L)))
    assert(got(3L) === ((0L, 0L, 16L, 0L, 0L)))
    // empty page: zero everything, density guard avoids div-by-zero
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0L)))
    // non-anchor a-tags (<article>) must NOT count as link text; a bare
    // attribute-less <a> still does (review catch on the anchor regex)
    val aTags = TextOps.extractMarkup(Seq(
      (1L, "<article>Long intro</article><a href=\"/x\">hi</a>"),
      (2L, "<a>bare</a>")).toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(aTags(1L) === ((1L, 2L)), "only the real anchor's 'hi' counts")
    assert(aTags(2L) === ((1L, 4L)))
    // extraction equality: same visible text => same clean_hash
    val h = TextOps.extractMarkup(Seq(
      (1L, "<p>same text</p>"), (2L, "same <b>text</b>")).toDF("doc_id", "html"),
      "doc_id", "html").collect().map(_.getString(6))
    assert(h(0) === h(1))
  }

  test("extractMarkup: generative property — random pages recover their known visible text") {
    // Build pages from a SPEC (segments of plain words, links, bold spans,
    // escaped entities), so the expected visible text, tag count and link
    // chars are known by construction — an independent check on the regex
    // pipeline, not a re-implementation of it.
    val rnd = new scala.util.Random(31)
    val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">")
    val pages = (0 until 40).map { id =>
      val nSeg = 1 + rnd.nextInt(6)
      var tags = 0L; var linkChars = 0L
      val visible = new StringBuilder; val html = new StringBuilder
      (0 until nSeg).foreach { _ =>
        val word = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5))
        rnd.nextInt(4) match {
          case 0 => // plain word
            html.append(word).append(" "); visible.append(word).append(" ")
          case 1 => // link
            html.append(s"""<a href="/x">$word</a> """); visible.append(word).append(" ")
            tags += 2; linkChars += word.length
          case 2 => // bold span
            html.append(s"<b>$word</b> "); visible.append(word).append(" ")
            tags += 2
          case 3 => // escaped entity between words
            val (ent, ch) = entities(rnd.nextInt(entities.size))
            html.append(word).append(ent).append(word).append(" ")
            visible.append(word).append(ch).append(word).append(" ")
        }
      }
      (id.toLong, html.toString, visible.toString.trim, tags,
        (visible.toString.trim.length.toLong, linkChars))
    }
    val df = pages.map(p => (p._1, p._2)).toDF("doc_id", "html")
    val got = TextOps.extractMarkup(df, "doc_id", "html").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    pages.foreach { case (id, _, _, tags, (textChars, linkChars)) =>
      val (gTags, gText, gLink) = got(id)
      assert(gTags === tags, s"page $id tags")
      assert(gText === textChars, s"page $id visible chars")
      assert(gLink === linkChars, s"page $id link chars")
    }
  }

  test("collocations: exclusive pair tops the PMI ranking, support floor drops singletons") {
    // T = 29 tokens. "zx qv" ×5 exclusive (c=5/5): pmi = 1e6·29 div 5.
    // "cc dd" ×2 with cc diluted to 10: ((2e6 div 10)·29) div 2.
    // "cc cc" ×7 inside the cc-run doc: ((7e6 div 10)·29) div 10.
    // "aa bb" ×1 and each "qv wI" ×1 fall under minCount=2.
    val docs = docsOf(
      (0 until 5).map(i => s"zx qv w$i") ++
      Seq("aa bb", "cc dd", "cc dd", "cc cc cc cc cc cc cc cc"))
    val got = TextOps.collocations(docs, "text", minCount = 2L, topK = 10)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("zx qv", 5L, 5L, 5L, 5800000L),
      ("cc dd", 2L, 10L, 2L, 2900000L),
      ("cc cc", 7L, 10L, 10L, 2030000L)))
  }

  test("qualityDecileBuckets: exact deciles when the sample covers the corpus") {
    // 100 docs with token counts exactly 1..100 → the 256-cap sample IS
    // the corpus, so cut_q = q-th smallest = q·10, and bucket membership
    // is hand-computable: bucket 0 ← 1..9 (9 docs), buckets 1..8 ← ten
    // docs each, bucket 9 ← 90..100 (11 docs).
    val docs = (1 to 100).map(w => (w.toLong, Seq.fill(w)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.qualityDecileBuckets(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = (0 to 9).map { b =>
      val ws = (1 to 100).filter(w => (1 to 9).count(c => c * 10 <= w) == b)
      (b.toLong, ws.size.toLong, ws.map(_.toLong).sum, ws.min.toLong, ws.max.toLong)
    }.toSet
    assert(got == expected)
    assert(got.toSeq.map(_._2).sum == 100L, "buckets partition the corpus")
  }

  test("sourceQualityMatrix: corpus-wide cutpoints, per-source share in bp") {
    // Same 1..100 token-count corpus; even doc_ids from "web", odd from
    // "book" — cutpoints stay corpus-wide (c_q = q·10), so each source's
    // cells are the even/odd split of the decile membership above.
    val docs = (1 to 100).map(w => (w.toLong,
        Seq.fill(w)("tok").mkString(" "), if (w % 2 == 0) "web" else "book"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceQualityMatrix(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val expected = (for {
      src <- Seq("web", "book")
      b <- 0 to 9
    } yield {
      val ws = (1 to 100).filter(w =>
        (if (src == "web") w % 2 == 0 else w % 2 == 1) &&
        (1 to 9).count(c => c * 10 <= w) == b)
      (src, b.toLong, ws.size.toLong, 50L, ws.size.toLong * 10000L / 50L)
    }).filter(_._3 > 0).toSet
    assert(got == expected)
  }
}
