package graft.sideline

import graft.filter.FilterSpec
import graft.model.{ConsumerPartition, ConsumerState}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SidelinePayloadSuite extends AnyFunSuite {

  private def payload(t: SidelineType = SidelineType.Start) = SidelinePayload(
    id = "req-1",
    sidelineType = t,
    step = FilterSpec.KeyIn("key", Seq("tenant-3")),
    startingState = ConsumerState(Map(ConsumerPartition("events", 0) -> 10L,
      ConsumerPartition("events", 1) -> 12L)),
    endingState = None)

  test("JSON roundtrip with and without ending state") {
    val p = payload()
    assert(SidelinePayload.fromJson(p.toJson) === p)
    val resolved = p.copy(sidelineType = SidelineType.Resolve,
      endingState = Some(ConsumerState(Map(ConsumerPartition("events", 0) -> 99L))))
    assert(SidelinePayload.fromJson(resolved.toJson) === resolved)
  }

  test("state machine: only START->RESUME->RESOLVE transitions are legal") {
    assert(payload(SidelineType.Start).transitionTo(SidelineType.Resume)
      .sidelineType === SidelineType.Resume)
    assert(payload(SidelineType.Resume).transitionTo(SidelineType.Resolve)
      .sidelineType === SidelineType.Resolve)
    intercept[IllegalArgumentException](payload(SidelineType.Start).transitionTo(SidelineType.Resolve))
    intercept[IllegalArgumentException](payload(SidelineType.Resolve).transitionTo(SidelineType.Start))
    intercept[IllegalArgumentException](payload(SidelineType.Resume).transitionTo(SidelineType.Start))
  }

  test("FileControlStore persists atomically, lists sorted, clears") {
    val dir = Files.createTempDirectory("graft-ctl").toString
    val store = new FileControlStore(dir)
    val a = payload().copy(id = "a")
    val b = payload().copy(id = "b")
    store.persist(b); store.persist(a)
    assert(store.list().map(_.id) === Seq("a", "b"))
    assert(store.retrieve("a") === Some(a))
    // overwrite with transition
    val a2 = a.transitionTo(SidelineType.Resume)
    store.persist(a2)
    assert(store.retrieve("a") === Some(a2))
    store.clear("a")
    assert(store.retrieve("a") === None)
    assert(store.list().map(_.id) === Seq("b"))
    intercept[IllegalArgumentException](store.retrieve("../evil"))
  }

  test("SidelineType.fromValue parses case-insensitively") {
    assert(SidelineType.fromValue("start") === SidelineType.Start)
    assert(SidelineType.fromValue("RESOLVE") === SidelineType.Resolve)
    intercept[IllegalArgumentException](SidelineType.fromValue("bogus"))
  }
}
