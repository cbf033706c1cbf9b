! Stubs for the two unresolved WRF externals in the reference core
! (module_noahmp_func.f90:377,709 call wrf_error_fatal/wrf_message).
! ~10 lines, as anticipated by SURVEY.md section 7 step 2.

subroutine wrf_message(msg)
  implicit none
  character(*), intent(in) :: msg
  write (*, '(A)') trim(msg)
end subroutine wrf_message

subroutine wrf_error_fatal(msg)
  implicit none
  character(*), intent(in) :: msg
  write (*, '(A)') 'FATAL: '//trim(msg)
  stop 1
end subroutine wrf_error_fatal
