package graft.tools

/** Dev inventory: dump every registered DFS node's option set, one line
  * per node (`name: opt1 opt2 …`), for diffing against the reference's
  * `options()` lists (scripts/opt_parity.py does the erl-side extraction
  * and the comparison).
  */
object OptAudit {
  def main(args: Array[String]): Unit = {
    graft.dfs.UserComponents.registerAll()
    graft.dfs.Planner.registeredOptions.toSeq.sortBy(_._1).foreach {
      case (name, opts) => println(s"$name: ${opts.toSeq.sorted.mkString(" ")}")
    }
    // compile-time check coverage (scripts/check_parity.py)
    graft.dfs.Planner.registeredCheckedOptions.toSeq.sortBy(_._1).foreach {
      case (name, opts) =>
        println(s"CHECK $name: ${opts.toSeq.sorted.mkString(" ")}")
    }
  }
}
