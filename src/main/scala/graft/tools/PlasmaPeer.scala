package graft.tools

import graft.sources.plasma.PlasmaStore

/** Tiny CLI client for the plasma store, used to exercise the
  * cross-process contract from specs (a second JVM creating/reading
  * objects in the same shared directory — reference:
  * cpp/src/plasma/client.h multi-client semantics).
  */
object PlasmaPeer {
  def main(args: Array[String]): Unit = args(0) match {
    case "put" =>
      val store = new PlasmaStore(args(1))
      val payload = args(3).getBytes("UTF-8")
      val buf = store.create(args(2), payload.length.toLong,
        "peer-meta".getBytes("UTF-8"))
      buf.put(payload)
      store.seal(args(2))
    case "claim" =>
      // race entrant: try to create (not seal) an id; report the outcome
      // so a spec can assert exactly one of N concurrent claimants wins
      val store = new PlasmaStore(args(1))
      try {
        store.create(args(2), 8)
        Console.out.print("won")
      } catch {
        case _: IllegalStateException => Console.out.print("lost")
      }
      Console.out.flush()
    case "get" =>
      val store = new PlasmaStore(args(1))
      store.get(args(2), timeoutMs = 20000) match {
        case Some(obj) =>
          Console.out.print(new String(obj.dataBytes, "UTF-8"))
          Console.out.flush()
        case None => sys.exit(2)
      }
    case other => sys.exit(64)
  }
}
