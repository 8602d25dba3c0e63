package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ConsumerStateSuite extends AnyFunSuite {

  test("JSON roundtrip") {
    val st = ConsumerState(Map(
      ConsumerPartition("events", 0) -> 41L,
      ConsumerPartition("events", 1) -> 39L,
      ConsumerPartition("other", 2) -> 0L))
    assert(ConsumerState.fromJson(st.toJson) === st)
    assert(ConsumerState.fromJson("{}") === ConsumerState.empty)
  }

  test("merge takes max per partition") {
    val a = ConsumerState(Map(ConsumerPartition("t", 0) -> 5L, ConsumerPartition("t", 1) -> 9L))
    val b = ConsumerState(Map(ConsumerPartition("t", 0) -> 7L, ConsumerPartition("t", 2) -> 1L))
    val m = ConsumerState.merge(a, b)
    assert(m.get(ConsumerPartition("t", 0)) === Some(7L))
    assert(m.get(ConsumerPartition("t", 1)) === Some(9L))
    assert(m.get(ConsumerPartition("t", 2)) === Some(1L))
  }

  test("roundtrip property: random states survive JSON (seeded)") {
    val rnd = new scala.util.Random(42)
    val namespaces = Seq("events", "topic-a", "topic_b", "with\"quote")
    (1 to 200).foreach { _ =>
      val pairs = (0 until rnd.nextInt(9)).map { _ =>
        ConsumerPartition(namespaces(rnd.nextInt(namespaces.size)), rnd.nextInt(65)) ->
          math.abs(rnd.nextLong() / 2)
      }
      val st = ConsumerState(pairs.toMap)
      assert(ConsumerState.fromJson(st.toJson) === st)
    }
  }
}
