package graft.tools

import graft.sources.Hdf5File

/** Dev inspector for HDF5 files: `runMain graft.tools.H5Tool <file> [path]`
  * prints the tree, dataset dims, and head values.
  */
object H5Tool {
  def main(args: Array[String]): Unit = {
    val f = new Hdf5File(args(0))
    try {
      def walk(p: String, depth: Int): Unit = {
        val children =
          try f.ls(p)
          catch { case _: Exception => Nil }
        if (children.isEmpty) {
          val d = f.dims(p)
          val n = math.min(5, d.product)
          val head =
            try f.readStrings(p, 0, n).mkString(", ")
            catch {
              case _: Exception =>
                try f.readDoubles(p, 0, n).mkString(", ")
                catch { case e: Exception => s"<${e.getMessage}>" }
            }
          println(s"${"  " * depth}$p  dims=${d.mkString("x")}  head=[$head]")
        } else {
          println(s"${"  " * depth}$p/")
          for (a <- Seq("sorting", "units"); v <- f.attr(p, a))
            println(s"${"  " * depth}  @$a = $v")
          children.foreach(c => walk(s"$p/$c", depth + 1))
        }
      }
      walk("", 0)
    } finally f.close()
  }
}
