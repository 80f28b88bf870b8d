package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins for the scratch-dir cleanup contract — in particular the
  * symlink rule: deleteRecursively must UNLINK a symlink, never follow
  * it (File.listFiles follows links, so recursing through one would
  * delete the target's contents — the streaming-source symlink farms
  * point INTO the real source data).
  */
class TempDirsSpec extends AnyFunSuite {

  test("deleteRecursively unlinks a dir-shaped symlink without " +
    "touching the target's contents") {
    val target = Files.createTempDirectory("tds_target")
    val inner = target.resolve("keep.txt")
    Files.writeString(inner, "payload")
    val scratch = Files.createTempDirectory("tds_scratch")
    val link = scratch.resolve("farm")
    Files.createSymbolicLink(link, target)
    TempDirs.deleteRecursively(scratch.toFile)
    // scratch and the link itself are gone …
    assert(!Files.exists(scratch))
    // … but the link TARGET and its contents survive
    assert(Files.exists(target))
    assert(Files.readString(inner) == "payload")
    TempDirs.deleteRecursively(target.toFile)
  }

  test("deleteRecursively still removes real trees and tolerates " +
    "file-shaped symlinks") {
    val root = Files.createTempDirectory("tds_tree")
    Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("a/b/x.txt"), "x")
    val ext = Files.createTempFile("tds_ext", ".txt")
    Files.writeString(ext, "ext")
    Files.createSymbolicLink(root.resolve("a/lnk"), ext)
    TempDirs.deleteRecursively(root.toFile)
    assert(!Files.exists(root))
    assert(Files.readString(ext) == "ext")
    Files.delete(ext)
  }

  test("dangling symlinks are unlinked, not fatal") {
    val root = Files.createTempDirectory("tds_dangle")
    Files.createSymbolicLink(root.resolve("gone"),
      Paths.get("/nonexistent/graft/target"))
    TempDirs.deleteRecursively(root.toFile)
    assert(!Files.exists(root))
  }
}
