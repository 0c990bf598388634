package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def finalSyms(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.select($"word", $"syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap

  test("wordVocab lowercases, keeps [a-z]+ only, counts corpus frequency") {
    val docs = Seq(
      (1L, "The cat  sat"),
      (2L, "cat cat-dog 42 x9 THE")
    ).toDF("doc_id", "text")
    val v = BpeTrainer.wordVocab(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "cat-dog", "42", "x9" rejected by the charset filter
    assert(v == Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L))
  }

  test("one merge round picks the max-frequency pair, ties lexicographic") {
    // pairs: (l,o) freq 2+3=5 via "low"(2)+"lower"(3)... hand-build instead:
    val vocab = Seq(("ab", 3L), ("bc", 3L), ("cd", 2L)).toDF("word", "freq")
    // (a,b)=3 and (b,c)=3 tie — lexicographically smaller (a,b) must win
    val (merges, state) = BpeTrainer.train(vocab, nMerges = 1)
    assert(merges.map(m => (m.lhs, m.rhs, m.pairFreq)) == Seq(("a", "b", 3L)))
    val syms = finalSyms(state)
    assert(syms("ab") == Seq("ab"))
    assert(syms("bc") == Seq("b", "c"))
  }

  test("greedy left-to-right apply never merges overlapping occurrences") {
    val vocab = Seq(("aaa", 5L), ("aaaa", 1L)).toDF("word", "freq")
    val (merges, state) = BpeTrainer.train(vocab, nMerges = 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "a")
    // pair count is per-occurrence: "aaa" has 2 adjacent (a,a), "aaaa" has 3
    assert(merges.head.pairFreq == 5L * 2 + 1L * 3)
    val syms = finalSyms(state)
    assert(syms("aaa") == Seq("aa", "a"), s"got ${syms("aaa")}")
    assert(syms("aaaa") == Seq("aa", "aa"), s"got ${syms("aaaa")}")
  }

  test("multi-round training matches the hand-computed Sennrich example") {
    // classic shape: {low:5, lower:2, newest:6, widest:3}
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (merges, state) = BpeTrainer.train(vocab, nMerges = 4, trackSymbolMass = true)
    // round 0: (e,s) 6+3=9 wins; round 1: (es,t) 9; round 2: (l,o) 7;
    // round 3: (lo,w) 7
    assert(merges.map(m => (m.lhs, m.rhs, m.pairFreq)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    // symbol mass drops by the merged occurrence count each round
    val mass0 = 5L * 3 + 2L * 5 + 6L * 6 + 3L * 6 // chars × freq = 79
    assert(merges.map(_.nSymsAfter) == Seq(mass0 - 9, mass0 - 18, mass0 - 25, mass0 - 32))
    val syms = finalSyms(state)
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("low", "e", "r"))
    assert(syms("newest") == Seq("n", "e", "w", "est"))
    assert(syms("widest") == Seq("w", "i", "d", "est"))
  }

  test("training stops early when every word is a single symbol") {
    val vocab = Seq(("ab", 1L)).toDF("word", "freq")
    val (merges, state) = BpeTrainer.train(vocab, nMerges = 10)
    assert(merges.size == 1)
    assert(finalSyms(state)("ab") == Seq("ab"))
  }

  test("encodeVocab with the trained merge table reproduces the training-final state") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (merges, trained) = BpeTrainer.train(vocab, nMerges = 4)
    val encoded = BpeTrainer.encodeVocab(vocab, merges)
    assert(finalSyms(encoded) == finalSyms(trained))
    // rank order matters: applying merges shuffled must NOT be relied on —
    // encodeVocab sorts by rank internally, so a shuffled input still works
    val shuffled = BpeTrainer.encodeVocab(vocab, merges.reverse)
    assert(finalSyms(shuffled) == finalSyms(trained))
  }

  test("merge table is invariant under vocab repartitioning") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val a = BpeTrainer.train(vocab, nMerges = 3)._1
    val b = BpeTrainer.train(vocab.repartition(13), nMerges = 3)._1
    assert(a == b)
  }

  test("batchSize=1 is byte-identical to unbatched training (the q188 contract)") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (m1, s1) = BpeTrainer.train(vocab, nMerges = 4, trackSymbolMass = true)
    val (mb, sb) = BpeTrainer.train(vocab, nMerges = 4, trackSymbolMass = true, batchSize = 1)
    assert(m1 == mb)
    assert(finalSyms(s1) == finalSyms(sb))
  }

  test("batched rounds pick symbol-disjoint merges and skip conflicts in rank order") {
    // round-start pair counts: (e,s)=9, (es,t) doesn't exist yet,
    // (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8, ... — under B=3 the picks must
    // be (e,s)=9 first, then (s,t)=9 SKIPPED (shares s), (w,e)=8 SKIPPED
    // (shares e), then (l,o)=7, then (o,w) SKIPPED (shares o) → next
    // non-conflicting pair.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (merges, _) = BpeTrainer.train(vocab, nMerges = 3, batchSize = 3)
    assert(merges.size == 3)
    // first pick is always the global argmax — identical to B=1 round 0
    assert((merges(0).lhs, merges(0).rhs, merges(0).pairFreq) == ("e", "s", 9L))
    // all three picks are symbol-disjoint, including created symbols
    val touched = merges.flatMap(m => Seq(m.lhs, m.rhs))
    assert(touched.distinct.size == touched.size, s"non-disjoint batch: $merges")
    val created = merges.map(m => m.lhs + m.rhs).toSet
    assert(touched.forall(sym => !created.contains(sym)))
    // ranks are sequential across the batch
    assert(merges.map(_.rank) == Seq(0, 1, 2))
  }

  test("batched training converges to the same encoding as sequential on disjoint tails") {
    // A vocab whose top pairs never conflict: batched and sequential
    // training must produce the SAME merge set (possibly different rank
    // interleaving) and the same final encoding when each pair's count is
    // untouched by the others.
    val vocab = Seq(("ab", 9L), ("cd", 7L), ("ef", 5L), ("gh", 3L))
      .toDF("word", "freq")
    val seq = BpeTrainer.train(vocab, nMerges = 4)
    val bat = BpeTrainer.train(vocab, nMerges = 4, batchSize = 4)
    assert(seq._1.map(m => (m.lhs, m.rhs, m.pairFreq)) ==
      bat._1.map(m => (m.lhs, m.rhs, m.pairFreq)))
    assert(finalSyms(seq._2) == finalSyms(bat._2))
    // and the batched run did it in ONE round's worth of merges
    assert(bat._1.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("encodeVocab reproduces batched training's final state too") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (merges, trained) = BpeTrainer.train(vocab, nMerges = 4, batchSize = 2)
    val encoded = BpeTrainer.encodeVocab(vocab, merges)
    assert(finalSyms(encoded) == finalSyms(trained))
  }

  test("trainRounds reports the executed round count and matches train verbatim") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (m1, s1) = BpeTrainer.train(vocab, nMerges = 4, batchSize = 2)
    val (m2, s2, rounds) = BpeTrainer.trainRounds(vocab, nMerges = 4, batchSize = 2)
    assert(m1 == m2)
    assert(finalSyms(s1) == finalSyms(s2))
    // rounds is bounded below by the batching floor and above by the
    // sequential count (conflict skips can only stretch, never compress)
    assert(rounds >= (m2.size + 1) / 2 && rounds <= m2.size,
      s"rounds=$rounds for ${m2.size} merges at B=2")
  }
}
