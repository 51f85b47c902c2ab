package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  import TextFunctions._

  test("tokenCount matches whitespace-split semantics") {
    assert(tokenCount("") == 0)
    assert(tokenCount("   ") == 0)
    assert(tokenCount("one") == 1)
    assert(tokenCount("one two  three\t four\nfive") == 5)
    assert(tokenCount(" leading and trailing ") == 3)
    assert(tokenCount(null) == 0)
  }

  test("bpeish token count approximates chars/4 plus punctuation") {
    assert(bpeishTokenCount("abcd") == 1)
    assert(bpeishTokenCount("abcdefgh") == 2)
    assert(bpeishTokenCount("hi!") == 2) // "hi" + "!"
    assert(bpeishTokenCount("a b") == 2)
    assert(bpeishTokenCount("") == 0)
  }

  test("quality stats count components exactly") {
    val q = qualityStats("The cat, the hat! 42 times")
    assert(q.tokens == 6)
    assert(q.stopwords == 2) // "The", "the"
    assert(q.punct == 2) // , !
    assert(q.digits == 2) // 4 2
    assert(q.chars == 26)
  }

  test("quality score orders obvious cases") {
    val good = qualityScore(
      "The quick brown fox jumps over the lazy dog and runs into the forest " +
        "where it finds a quiet stream of water to drink from in the morning.")
    val gibberish = qualityScore("x9f$k2@pq!!! ##$$ 0x4f3a 9912 %%%% zzzzzzzzzzzzzzzzzzzzzzzzz")
    val tiny = qualityScore("ok")
    assert(good > 0.7, s"good=$good")
    assert(gibberish < 0.3, s"gibberish=$gibberish")
    assert(tiny < 0.2, s"tiny=$tiny")
    assert(qualityScore("") == 0.0)
  }

  test("language identification on real multilingual snippets") {
    assert(langId("the quick brown fox is in the garden and it was a fine day") == "en")
    assert(langId("der Hund ist nicht in dem Haus und die Katze ist mit den Kindern") == "de")
    assert(langId("le chat est dans la maison et les enfants sont dans le jardin pour vous") == "fr")
    assert(langId("el perro es grande y la casa es bonita para los ninos que juegan con el") == "es")
    assert(langId("这是一个中文句子用来测试语言识别功能") == "zh")
    assert(langId("это русский текст для проверки определения языка") == "ru")
    assert(langId("") == "und")
    assert(langId("12345 67890 !!!") == "und")
  }

  test("fingerprint is whitespace/case canonical and collision-distinct") {
    assert(fingerprint64("Hello  World") == fingerprint64("hello world"))
    assert(fingerprint64(" hello world \n") == fingerprint64("hello world"))
    assert(fingerprint64("hello world") != fingerprint64("hello worlds"))
  }

  test("minhash signature equality fraction approximates Jaccard") {
    val base = (1 to 200).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 180).map(i => s"word$i").mkString(" ") + " " +
      (1 to 20).map(i => s"other$i").mkString(" ")
    val different = (1000 to 1200).map(i => s"word$i").mkString(" ")
    val sigA = minhashSignature(base, 128)
    val sigA2 = minhashSignature(base, 128)
    val sigB = minhashSignature(nearDup, 128)
    val sigC = minhashSignature(different, 128)
    assert(sigA.sameElements(sigA2), "identical text must give identical signature")
    val jAB = shingleJaccard(base, nearDup)
    val matchFrac = sigA.zip(sigB).count { case (x, y) => x == y } / 128.0
    assert(math.abs(matchFrac - jAB) < 0.15, s"matchFrac=$matchFrac jaccard=$jAB")
    val matchC = sigA.zip(sigC).count { case (x, y) => x == y } / 128.0
    assert(matchC < 0.1, s"disjoint texts should share almost no minhashes: $matchC")
  }

  test("simhash: near-identical texts have small Hamming distance") {
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val similar = (1 to 295).map(i => s"tok$i").mkString(" ") + " x y z q r"
    val different = (500 to 800).map(i => s"zzz$i").mkString(" ")
    val h1 = simhash64(base)
    val h2 = simhash64(similar)
    val h3 = simhash64(different)
    assert(hammingDistance(h1, h2) <= 8, s"similar hamming=${hammingDistance(h1, h2)}")
    assert(hammingDistance(h1, h3) >= 16, s"different hamming=${hammingDistance(h1, h3)}")
    assert(simhash64(base) == h1)
  }

  test("shingle jaccard endpoints") {
    assert(shingleJaccard("a b c d e", "a b c d e") == 1.0)
    assert(shingleJaccard("a b c d e", "v w x y z") == 0.0)
    assert(shingleJaccard("", "") == 1.0)
    assert(shingleJaccard("a b c d", "") == 0.0)
  }
}
