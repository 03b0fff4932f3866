package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FsSpec extends AnyFunSuite {

  test("deleteRecursively removes a directory symlink, never its target") {
    val target = Files.createTempDirectory("graft_fs_target")
    val inside = Files.createFile(target.resolve("precious.txt"))
    val tree = Files.createTempDirectory("graft_fs_tree")
    Files.createFile(tree.resolve("a.txt"))
    val link = tree.resolve("link-to-target")
    Files.createSymbolicLink(link, target)
    graft.util.Fs.deleteRecursively(tree)
    assert(!Files.exists(tree), "tree should be gone")
    assert(Files.exists(inside), "symlink target contents must survive")
    graft.util.Fs.deleteRecursively(target)
  }

  test("deleteRecursively on a missing path is a no-op") {
    graft.util.Fs.deleteRecursively(
      java.nio.file.Paths.get("/tmp/graft_fs_does_not_exist_xyz"))
  }
}
